package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weights: target-resembling docs outrank off-target
  * docs, the score is partitioning-invariant (exact integer sums), and
  * the bucket-weight table reaches the scoring join as a broadcast. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary {alpha..delta}; off-target {wx, yz, qq, kk}
  private val docs = Seq(
    (1L, "en", "alpha beta gamma delta alpha beta"),
    (2L, "en", "beta gamma delta delta gamma beta"),
    (3L, "de", "alpha beta gamma delta"),         // raw doc shaped like target
    (4L, "de", "wx yz qq kk wx yz"),              // raw doc unlike target
    (5L, "fr", "alpha wx beta yz")                // mixed
  ).toDF("doc_id", "lang", "text")

  test("target-shaped raw docs outscore off-target docs") {
    val scores = Dsir.importanceWeights(docs, isTarget = $"lang" === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(3L) > scores(4L))
    assert(scores(3L) > scores(5L) && scores(5L) > scores(4L))
    spark.catalog.clearCache()
  }

  test("scores are invariant to input partitioning") {
    val a = Dsir.importanceWeights(docs.repartition(1), $"lang" === "en")
      .orderBy($"doc_id").collect().toSeq
    spark.catalog.clearCache()
    val b = Dsir.importanceWeights(docs.repartition(7), $"lang" === "en")
      .orderBy($"doc_id").collect().toSeq
    spark.catalog.clearCache()
    assert(a === b)
  }

  test("plan: bucket weights broadcast to the scoring join") {
    val plan = Dsir.importanceWeights(docs, $"lang" === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    spark.catalog.clearCache()
  }
}
