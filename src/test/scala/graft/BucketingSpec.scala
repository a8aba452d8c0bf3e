package graft

import graft.sources.Tables

/** Bucketing: pre-shuffling fact tables on the join key at write time so
  * repeated joins run shuffle-free — the co-location technique the 100 TB
  * plan relies on for fact-fact joins (task checklist: "bucketing for
  * co-located joins"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy must rely on co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").hint("merge")
        .join(spark.table("ord_bucketed").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: same result as the plain join
      val expected = li.join(ord, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
