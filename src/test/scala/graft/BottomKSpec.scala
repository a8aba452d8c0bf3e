package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.BottomK.bottomK
import graft.functions.VectorFunctions.l2sq
import graft.sources.Tables

/** BottomK must be value-equivalent to the window form on real data, and
  * must plan as a partial+final object-hash aggregate (the scale win). */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    e.crossJoin(broadcast(q))
      .select($"label", $"vec_id", l2sq($"embedding", $"qvec").as("distance"))
  }

  test("bottomK ≡ window row_number top-k per group (all labels, k=5)") {
    val viaAgg = scored.groupBy($"label")
      .agg(bottomK($"distance", $"vec_id", 5).as("hits"))
      .select($"label", posexplode($"hits"))
      .select($"label", $"pos", $"col.id".as("vec_id"), $"col.distance".as("distance"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy($"label").orderBy($"distance", $"vec_id")
    val viaWindow = scored
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"label", ($"rn" - 1).as("pos"), $"vec_id", $"distance")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg === viaWindow)
  }

  test("k larger than group returns whole group ascending") {
    val one = Seq((1, 10L, 3.0), (1, 11L, 1.0), (1, 12L, 2.0))
      .toDF("g", "id", "d")
      .groupBy($"g").agg(bottomK($"d", $"id", 100).as("hits"))
      .select(explode($"hits")).select($"col.id")
      .collect().map(_.getLong(0)).toSeq
    assert(one === Seq(11L, 12L, 10L))
  }

  test("ties break by id (deterministic)") {
    val hits = Seq((1, 5L, 1.0), (1, 3L, 1.0), (1, 4L, 1.0))
      .toDF("g", "id", "d")
      .groupBy($"g").agg(bottomK($"d", $"id", 2).as("hits"))
      .select(explode($"hits")).select($"col.id")
      .collect().map(_.getLong(0)).toSeq
    assert(hits === Seq(3L, 4L))
  }

  test("plans as partial+final ObjectHashAggregate (map-side top-k)") {
    val df = scored.groupBy($"label").agg(bottomK($"distance", $"vec_id", 3).as("hits"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, "expected partial+final")
  }
}
