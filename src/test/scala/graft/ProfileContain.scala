package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Dedup
import graft.sources.Tables
import graft.functions.TextFunctions.{tokens, hash32}

/** Stage-level timing of the exact containment join at sf0.1 —
  * candidate generation vs distinct vs verify, plus volumes. */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val (withSig, memberMap) = t("prep (collapse+sig)") {
      Dedup.containmentPrep(docs, "text", "doc_id", 1)
    }
    println(s"reps = ${withSig.count()}")
    println(s"members = ${memberMap.count()}")

    val toks = withSig.select(col("rep"), explode(col("hsd")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("toks count")(println(s"tokens = ${toks.count()}"))

    val freq = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    t("freq")(println(s"distinct tokens = ${freq.count()}"))

    val ordered = toks.join(freq, "t")
      .groupBy(col("rep"))
      .agg(sort_array(collect_list(struct(col("cnt"), col("t")))).as("ct"))
      .select(col("rep"), transform(col("ct"), x => x.getField("t")).as("ot"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("ordered")(ordered.count())

    val num = 9; val den = 10
    def ceilFrac(a: org.apache.spark.sql.Column) =
      floor((a * num + (den - 1)) / lit(den)).cast("int")
    val prefLen = size(col("ot")) - ceilFrac(size(col("ot"))) + 1
    val sizes = withSig.select(col("rep"), size(col("hsd")).as("n"))
    val pref = ordered
      .select(col("rep"), explode(slice(col("ot"), lit(1), prefLen)).as("t"))
      .join(sizes, "rep")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("pref")(println(s"prefix rows = ${pref.count()}"))

    val allt = toks.join(sizes, "rep")
    val candRaw = pref.select(col("rep").as("ida"), col("n").as("na"), col("t"))
      .join(allt.select(col("rep").as("idb"), col("n").as("nb"), col("t")), "t")
      .filter(col("ida") =!= col("idb") &&
        (col("na") < col("nb") ||
          (col("na") === col("nb") && col("ida") < col("idb"))))
    t("candRaw count")(println(s"raw cand rows = ${candRaw.count()}"))

    val cand = candRaw
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("cand distinct")(println(s"cand pairs = ${cand.count()}"))

    val verified = t("verify") {
      val v = cand
        .join(withSig.as("wa"), col("wa.rep") === col("id1"))
        .join(withSig.as("wb"), col("wb.rep") === col("id2"))
        .select(col("id1"), col("id2"),
          size(array_intersect(col("wa.hsd"), col("wb.hsd")))
            .cast("double").as("inter"),
          least(size(col("wa.hsd")), size(col("wb.hsd")))
            .cast("double").as("mn"))
        .filter(col("inter") / col("mn") >= 0.9)
      println(s"verified = ${v.count()}"); v
    }

    t("full query end-to-end") {
      val r = Dedup.containmentPairsExact(docs)
      println(s"output rows = ${r.count()}")
    }
    spark.stop()
  }
}
