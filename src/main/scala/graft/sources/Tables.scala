package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver testdata tables.
  *
  * The reference declares its schema externally (protos + per-cluster
  * dimension config, `proto/search.proto:45-49`, `proto/config.proto:7-11`)
  * and validates on load (`src/index/vector_shard.cc:34-43`). We mirror
  * that stance: never `inferSchema`; every read carries a declared
  * `StructType` so a drifting file fails analysis, not silently.
  *
  * At 100 TB scale explicit schemas also guarantee column pruning works
  * from the first plan (no sampling pass over exabytes of footers).
  */
object Tables {

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("label", IntegerType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  // events.parquet has shipped with TWO ts encodings across driver
  // rounds: TIMESTAMP(NANOS, ntz) — which Spark's parquet reader only
  // surfaces as a raw int64 under spark.sql.legacy.parquet.nanosAsLong
  // (set by Verify/Bench/tests) — and plain TIMESTAMP(MICROS, ntz).
  // load() probes the footer once per path (cached; no data scan) and
  // branches: nanos → read long, `div 1000` to micros; micros → read as
  // TIMESTAMP_NTZ directly. Both land on identical micro-precision NTZ
  // values, the same truncation the DuckDB oracle's reader applies.
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType, nullable = false),
    StructField("r_name", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType, nullable = false),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType, nullable = false),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType, nullable = false),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = false),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType, nullable = false),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  private val schemas: Map[String, StructType] = Map(
    "embeddings" -> embeddingsSchema,
    "documents" -> documentsSchema,
    "events" -> eventsSchema,
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema)

  /** Footer-inferred ts type per events.parquet (path, mtime, length):
    * LongType means the legacy NANOS encoding (surfaced as raw int64
    * under nanosAsLong); anything else is the MICROS encoding, readable
    * as a timestamp. Keyed on (mtime, length) so an in-JVM regeneration
    * with the other encoding re-probes even when it lands inside mtime
    * granularity (ADVICE r8); keyed per path with stale entries evicted,
    * so the map is bounded by the number of distinct paths. */
  private val eventsTsEncoding =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, DataType)]()

  /** Read one testdata table with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      val f = new java.io.File(path)
      val (mtime, len) = (f.lastModified(), f.length())
      val tsType = eventsTsEncoding.compute(path, (p, prev) =>
        if (prev != null && prev._1 == mtime && prev._2 == len) prev
        else (mtime, len, spark.read.parquet(p).schema("ts").dataType))._3
      if (tsType == LongType)
        spark.read.schema(eventsSchema).parquet(path)
          .withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      else {
        val micros = StructType(eventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
        spark.read.schema(micros).parquet(path)
      }
    } else spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")

  /** The session's configured shuffle width — the one number every
    * explicit-width repartition in the engine keys on. Rationale (stated
    * once here, referenced by the call sites — ADVICE r16): AQE sizes
    * stages by BYTES, so a byte-light but compute-dense frame (candidate
    * pairs awaiting an array-merge verify, a pinned index about to fan
    * into serve joins) gets coalesced to ~1-2 partitions at small SF —
    * and a localCheckpoint FREEZES that width into every downstream
    * consumer. A user-specified repartition count is exempt from AQE
    * coalescing; at cluster scale the conf is sized to the cluster, so
    * the same call stays spread there. */
  def sessionWidth(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

  /** Explicit-width repartition to [[sessionWidth]] — lazy, safe on any
    * plan (no width probe; use where the frame is KNOWN compute-dense
    * or about to be pinned). */
  def spreadToWidth(df: DataFrame): DataFrame =
    df.repartition(sessionWidth(df.sparkSession))

  /** Spread a frame to the session's shuffle width ONLY when its scan
    * under-splits it (a one-row-group parquet file is a single task no
    * matter what maxPartitionBytes says — and heavy per-row compute
    * riding such a scan runs serial). At production split counts this
    * is a no-op: the condition keeps zero-shuffle pipelines
    * zero-shuffle exactly where the cluster already parallelizes the
    * scan for free. Round-robin, row-local-safe.
    *
    * SCAN-ONLY BY CONSTRUCTION (ADVICE r16): the width probe reads
    * `df.rdd`, which finalizes the physical plan — under AQE that would
    * eagerly EXECUTE any upstream shuffle stages as a side effect of a
    * width check. So the probe only runs when the analyzed plan is
    * scan-shaped (a leaf under row-local projections/filters/aliases —
    * nothing upstream to execute); any other plan is returned unchanged
    * (callers that want width on a shuffled frame say so explicitly
    * with [[spreadToWidth]]). */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case pr: Project => scanShaped(pr.child)
      case f: Filter => scanShaped(f.child)
      case a: SubqueryAlias => scanShaped(a.child)
      case _ => false
    }
    if (!scanShaped(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions < sessionWidth(df.sparkSession))
      spreadToWidth(df)
    else df
  }
}
