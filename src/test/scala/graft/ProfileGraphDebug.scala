package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, KnnGraph}
import graft.sources.Tables

object ProfileGraphDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01").persist()
    val q = e.filter($"vec_id" === 0L).select($"embedding").head.getSeq[Float](0).toArray

    val exact = e.select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", lit(q)).as("d"))
      .orderBy($"d", $"vec_id").limit(20).collect()
    println("exact top-20 for q=0: " +
      exact.map(r => s"${r.getLong(0)}:${"%.3f".format(r.getDouble(1))}").mkString(" "))

    val g = KnnGraph.build(e, m = 4).persist()
    g.count()
    println("graph edges of 0: " + g.filter($"vec_id" === 0L)
      .orderBy($"nbr_rank").collect()
      .map(r => s"${r.getLong(2)}:${"%.3f".format(r.getDouble(3))}").mkString(" "))
    // are exact top-10 ids reachable from node 0 in <=3 hops?
    val edges = g.select($"vec_id".as("u"), $"nbr_id".as("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var reach = Set(0L)
    (1 to 3).foreach { h =>
      reach = reach ++ reach.flatMap(n => adj.getOrElse(n, Set.empty))
      println(s"hop $h: reachable=${reach.size}")
    }
    val exact10 = exact.take(10).map(_.getLong(0)).toSet
    println("exact10 ∩ reachable(3 hops from 0): " + (exact10 & reach).size)

    // one NN-Descent round: how many edges change?
    val g1 = KnnGraph.nnDescentRound(e, g, 4).persist()
    g1.count()
    val before = g.select($"vec_id", $"nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = g1.select($"vec_id", $"nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"edges changed by nn-descent: ${(after -- before).size} of ${after.size}")
    // block sizes
    val (_, assigned) = graft.operators.Dedup.ivfTwoLevelBlocks(e, 64, "vec_id", "embedding")
    println("block count: " + assigned.select($"blk").distinct().count())
    spark.stop()
  }
}
