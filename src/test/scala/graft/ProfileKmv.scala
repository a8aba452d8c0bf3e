package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{tokens, wordShingles, hash32}
import graft.sources.Tables

/** Stage attribution for distinct_kmv at sf0.1: where do its ~4 s go —
  * shingle build, the (source, gram) distinct shuffle, the md5 hash, or
  * the BottomK fold? */
object ProfileKmv {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(what: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$what%-50s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (pass <- Seq("cold", "warm")) {
      println(s"== $pass")
      val sh = Tables.documents(spark, sf)
        .select($"source", wordShingles(tokens($"text"), 2).as("gs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("1 shingle build + persist")(sh.count())
      val pairs = sh.select($"source", explode($"gs").as("g"))
      t("2 explode only")(pairs.count())
      val dist = pairs.distinct()
      t("3 + distinct (source,g)")(dist.count())
      val hashed = dist.select($"source", hash32($"g").as("h"))
      t("4 + hash32")(hashed.agg(count(lit(1))).collect())
      t("5 full kmvDistinct")(
        graft.operators.Sketch.kmvDistinct(pairs, "source", "g", k = 64)
          .orderBy($"source").count())
      sh.unpersist()
    }
    spark.stop()
  }
}
