package graft

import org.apache.spark.sql.functions._
import graft.operators.Sq
import graft.sources.Tables

/** Scalar quantization: bounds training is exact and dim-bounded,
  * engine codes equal a driver-side replay bit-for-bit, the integer
  * distance is an exact sum, and the SQ8 ranking closely tracks the
  * exact one (rerank recovers it). */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val model = Sq.train(e)
  private lazy val query: Array[Float] =
    e.filter($"vec_id" === 0L).select($"embedding").head.getSeq[Float](0).toArray

  test("train: per-dimension bounds match a driver-side scan; dim-sized, not N-sized") {
    val rows = e.select($"embedding").collect().map(_.getSeq[Float](0))
    val dim = rows.head.size
    assert(model.dim === dim)
    (0 until dim).foreach { d =>
      assert(model.mins(d) === rows.map(_(d)).min)
      assert(model.maxs(d) === rows.map(_(d)).max)
    }
  }

  test("encode: engine codes equal the driver-side formula replay exactly") {
    val enc = Sq.encode(e, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val byId = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    byId.foreach { case (id, emb) =>
      assert(enc(id) === Sq.encodeLocal(model, emb).toSeq, s"row $id")
    }
    assert(enc.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // the per-dimension extremes themselves code to the rail values
    assert(enc.values.exists(_.contains(0)))
    assert(enc.values.exists(_.contains(255)))
  }

  test("distance: engine integer distance equals the driver-side sum; rerank == exact top-k") {
    val qc = Sq.encodeLocal(model, query)
    val got = Sq.sqTopK(Sq.encode(e, model), model, query, k = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val enc = Sq.encode(e, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    enc.foreach { case (id, codes) =>
      val expect = codes.zip(qc).map { case (a, b) =>
        (a - b).toLong * (a - b) }.sum
      assert(got(id) === expect, s"row $id")
    }
    // two-stage serving recovers the exact ranking at r=50
    val reranked = Sq.sqTopKRerank(Sq.encode(e, model), e, model, query, r = 50, k = 10)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    val exact = e.select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", lit(query)).as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(reranked === exact)
  }

  test("sq ranking quality: top-10 by integer distance recalls most of the exact top-10") {
    val sq10 = Sq.sqTopK(Sq.encode(e, model), model, query, k = 10)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val exact10 = e.select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", lit(query)).as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    // 8-bit per-dim quantization blurs near-ties; rerank (above) recovers
    // the exact order — this bound just pins "close", not "equal"
    assert((sq10 & exact10).size >= 6, s"recall ${(sq10 & exact10).size}/10")
  }

  test("plan: encode+search is one scan projection, top-k is TakeOrderedAndProject") {
    val plan = Sq.sqTopK(Sq.encode(e, model), model, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
