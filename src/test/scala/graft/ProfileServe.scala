package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput evidence for the resident serve loop
  * (VERDICT r16 next #2): queries/sec and p50/p99 latency at
  * concurrency 1/8/64 over a pre-opened snapshot, next to the
  * job-dispatch serving floor (`SearchService.search`, one Spark job
  * per query — the cost the bench's `hop_dispatch_s` meters). Rows go
  * to BASELINE.md. Values are pinned equal by ServeLoopSpec; this
  * harness measures only. */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def pct(sorted: Array[Long], p: Double): Double =
      sorted(math.min(sorted.length - 1, (p * sorted.length).toInt)) / 1e6

    /** Run `nq` queries across `c` threads; return (qps, p50 ms, p99 ms). */
    def drive(c: Int, nq: Int, one: Int => Unit): (Double, Double, Double) = {
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(c)
      val t0 = System.nanoTime()
      val futs = (1 to c).map(_ => pool.submit(new Runnable {
        override def run(): Unit = {
          var i = next.getAndIncrement()
          while (i < nq) {
            val q0 = System.nanoTime()
            one(i)
            lat.add(System.nanoTime() - q0)
            i = next.getAndIncrement()
          }
        }
      }))
      futs.foreach(_.get())
      val wall = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      val arr = lat.toArray(new Array[java.lang.Long](0)).map(_.toLong).sorted
      (nq / wall, pct(arr, 0.50), pct(arr, 0.99))
    }

    // --- corpus 1: the sf embeddings table (real data, d=64) ---
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val svc = new graft.operators.SearchService(emb, idCol = "vec_id")
    val loop = svc.residentLoop().get
    val n = loop.size; val d = loop.dim
    // deterministic distinct query stream: corpus vectors, one
    // coordinate nudged per index (distinct → no QueryMemo hits on the
    // service side; the loop has no cache at all)
    val baseQs: Array[Array[Float]] = emb.orderBy(col("vec_id")).limit(256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    def qOf(i: Int): Seq[Float] = {
      val v = baseQs(i % baseQs.length).clone()
      v(i % d) = v(i % d) + (i % 17) * 0.01f
      v.toIndexedSeq
    }
    val K = 10

    // warmup both paths
    (0 until 64).foreach(i => loop.search(qOf(i), K))
    (0 until 8).foreach(i => svc.search(qOf(i), K))

    // job-dispatch floor (sequential — the per-query Spark-job shape;
    // concurrency just queues on the scheduler)
    val (sqps, sp50, sp99) = drive(1, 48, i => svc.search(qOf(10000 + i), K))
    println(f"PROFSERVE svc  n=$n d=$d c=1  qps=$sqps%9.1f p50_ms=$sp50%8.3f p99_ms=$sp99%8.3f")

    for (c <- Seq(1, 8, 64)) {
      val nq = 20000
      val (qps, p50, p99) = drive(c, nq, i => loop.search(qOf(i), K))
      println(f"PROFSERVE loop n=$n d=$d c=$c%-2d qps=$qps%9.1f p50_ms=$p50%8.3f p99_ms=$p99%8.3f")
    }

    // --- corpus 2: synthetic 1M x 64 resident corpus (the cap-scale
    // row: what one serving replica of this loop carries) ---
    for (big <- Seq(100000, 1000000)) {
      val synth = spark.range(big).select(col("id"),
        expr("transform(sequence(0, 63), j -> cast(sin(id * 1.31 + j) as float))")
          .as("embedding"))
      val bigLoop = graft.operators.ServeLoop.open(synth).get
      (0 until 32).foreach(i => bigLoop.search(qOf(i), K))
      for (c <- Seq(1, 8, 64)) {
        val nq = if (big >= 1000000) 2000 else 8000
        val (qps, p50, p99) = drive(c, nq, i => bigLoop.search(qOf(i), K))
        println(f"PROFSERVE loop n=$big d=64 c=$c%-2d qps=$qps%9.1f p50_ms=$p50%8.3f p99_ms=$p99%8.3f")
      }
    }
    if (args.headOption.contains("graph")) graphMode(spark, dir)
    spark.stop()
  }

  /** `graph` mode (VERDICT r17 next #3's "done" rows): the RESIDENT
    * hierarchical-ADC serve — qps/p50/p99 at c=1/8/64 over a 1 M-row
    * persisted store loaded once ([[graft.sources.GraphStore
    * .openResidentHier]]), next to the per-hop point-lookup walk it
    * replaces (2 bounded jobs per layer-0 hop). Values are pinned equal
    * by DriverWalkSpec; this harness measures only. Replica count
    * overridable: `graph 100` → 200 k rows. */
  private def graphMode(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    import graft.operators.{KnnGraph, Pq}
    import graft.sources.{GraphStore, Tables}
    val rep = sys.props.get("graft.profileServeRep").map(_.toInt).getOrElse(500)
    val embBase = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val e = (0 until rep).map(i =>
      embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        $"embedding")).reduce(_ unionByName _)
      .repartition(32).localCheckpoint(true)
    val n = e.count()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft-serveprof-$rep").toString
    try {
      val t0 = System.nanoTime()
      val model = Pq.trainRefined(embBase, m = 8, ks = 16, iters = 1)
      val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2,
        rounds = 2, maxLevel = 2)
      GraphStore.write(layers, store, buckets = 64)
      GraphStore.writeCorpus(e, store)
      GraphStore.writeCodes(Pq.encode(e, model), store)
      println(f"PROFSERVE graph build n=$n wall_s=${(System.nanoTime() - t0) / 1e9}%.1f")

      val baseQs: Array[Array[Float]] = embBase.orderBy($"vec_id").limit(256)
        .select($"embedding").collect().map(_.getSeq[Float](0).toArray)
      def qvOf(i: Int): Array[Float] = {
        val v = baseQs(i % baseQs.length).clone()
        v(i % v.length) = v(i % v.length) + (i % 17) * 0.01f
        v
      }
      val K = 10

      // the per-hop point-lookup walk (job-dispatch floor of the ANN
      // serve): one query per call, sequential
      def qdf(i: Int) = Seq((i.toLong, qvOf(i).toSeq)).toDF("qid", "qv")
      GraphStore.hierSearchPointLookupAdc(spark, store, qdf(0), model,
        beam = 8, hops = 3, k = K).count() // warm
      val (wqps, wp50, wp99) = drive(1, 24, i =>
        GraphStore.hierSearchPointLookupAdc(spark, store, qdf(1000 + i),
          model, beam = 8, hops = 3, k = K).count())
      println(f"PROFSERVE walk n=$n c=1  qps=$wqps%9.1f p50_ms=$wp50%8.3f p99_ms=$wp99%8.3f")

      val tOpen = System.nanoTime()
      val serve = GraphStore.openResidentHier(spark, store, model,
        beam = 8, hops = 3).get
      println(f"PROFSERVE graph open wall_s=${(System.nanoTime() - tOpen) / 1e9}%.1f")
      (0 until 64).foreach(i => serve.search(qvOf(i), K))
      for (c <- Seq(1, 8, 64)) {
        val nq = 20000
        val (qps, p50, p99) = drive(c, nq, i => serve.search(qvOf(i), K))
        println(f"PROFSERVE graph n=$n c=$c%-2d qps=$qps%9.1f p50_ms=$p50%8.3f p99_ms=$p99%8.3f")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(store))
  }

  /** Run `nq` queries across `c` threads; (qps, p50 ms, p99 ms). */
  private def drive(c: Int, nq: Int, one: Int => Unit): (Double, Double, Double) = {
    def pct(sorted: Array[Long], p: Double): Double =
      sorted(math.min(sorted.length - 1, (p * sorted.length).toInt)) / 1e6
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(c)
    val t0 = System.nanoTime()
    val futs = (1 to c).map(_ => pool.submit(new Runnable {
      override def run(): Unit = {
        var i = next.getAndIncrement()
        while (i < nq) {
          val q0 = System.nanoTime()
          one(i)
          lat.add(System.nanoTime() - q0)
          i = next.getAndIncrement()
        }
      }
    }))
    futs.foreach(_.get())
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    val arr = lat.toArray(new Array[java.lang.Long](0)).map(_.toLong).sorted
    (nq / wall, pct(arr, 0.50), pct(arr, 0.99))
  }
}
