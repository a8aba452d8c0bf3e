package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchases enriched with the same user's
  * views within the preceding hour — watermarks on both sides bound the
  * join state (required for unbounded streams). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = new Timestamp(86400000L + m * 60000L)

  test("purchases join views within 1h window, state bounded by watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val v = views.toDF().select($"user_id".as("v_user"), $"ts".as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val p = purchases.toDF().select($"user_id".as("p_user"), $"ts".as("purchase_ts"),
        $"value".as("amount"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = p.join(v,
      $"p_user" === $"v_user" &&
        $"view_ts" <= $"purchase_ts" &&
        $"view_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      views.addData(Ev(t(0), "view", 1, 0), Ev(t(10), "view", 1, 0), Ev(t(5), "view", 2, 0))
      purchases.addData(Ev(t(30), "purchase", 1, 9.99))
      q.processAllAvailable()
      val rows = spark.table("ssj_out").collect()
      // user 1's purchase at t+30 matches both prior views (t0, t10)
      assert(rows.length === 2)
      assert(rows.forall(_.getAs[Long]("p_user") == 1L))
      // a view outside the hour window must not match
      views.addData(Ev(t(40), "view", 3, 0))
      purchases.addData(Ev(t(200), "purchase", 3, 1.0))
      q.processAllAvailable()
      val later = spark.table("ssj_out").collect()
      assert(later.count(_.getAs[Long]("p_user") == 3L) === 0)
    } finally q.stop()
  }
}
