package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bq

/** Persisted multi-index-hashing layout for binary signatures — the
  * point-lookup store [[Bq.mihTopK]]'s own doc describes (VERDICT r10
  * missing #4: every MIH probe scanned all N signatures — fine
  * per-node, still O(N) at 100 TB). Norouzi CVPR'12's multi-index IS a
  * replicated table — one row per (signature, substring) — and this
  * store is that table as a parquet layout:
  *
  *  - `index/` — (vec_id, sig ARRAY<BIGINT>, j, chunk), directory-
  *    partitioned by `j` (substring index) and `chunk` (substring
  *    value), sorted by vec_id within files. Replication factor =
  *    words·64/chunkBits rows per signature (8× at one word /
  *    chunkBits 8 — 64 bytes per 8-byte signature, still ~4× under
  *    the raw float32 it replaces).
  *  - `stats/` — one row (words, chunk_bits).
  *
  * A probe reads EXACTLY its substrings' (j, value) directories —
  * partition pruning opens words·64/chunkBits dirs holding ~N/2^chunkBits
  * rows each, so the probe touches ~candidates·replication rows instead
  * of N — then candidates collapse by id and only they get the full
  * Hamming evaluation. Pigeonhole recall to radius substrings−1 is
  * unchanged from the scan form ([[Bq.mihTopK]] semantics;
  * BinaryStoreSpec pins value equality both narrow and wide).
  * Partitioning by raw chunk value is designed for chunkBits ≤ 8
  * (≤ 256 directories per substring); wider chunks belong to the
  * scan-form index. */
object BinaryStore {

  /** Persist a signature frame (`sig ARRAY<BIGINT>` — [[Bq.encodeWide]]
    * output; wrap single-word [[Bq.encode]] sigs via `array(sig)`).
    * Overwrites `path`. */
  def write(encoded: DataFrame, path: String, chunkBits: Int = 8,
      idCol: String = "vec_id"): Unit = {
    require(chunkBits >= 1 && chunkBits <= 8 && 64 % chunkBits == 0,
      s"chunkBits $chunkBits must divide 64 and be <= 8 for the partition layout")
    val nWords = encoded.select(size(col("sig"))).head.getInt(0)
    val perWord = 64 / chunkBits
    val mask = (1L << chunkBits) - 1L
    val chunks = array((0 until nWords * perWord).map { j =>
      val w = j / perWord
      val off = chunkBits * (j % perWord)
      struct(lit(j).as("j"),
        shiftright(element_at(col("sig"), w + 1), off)
          .bitwiseAND(lit(mask)).as("chunk"))
    }: _*)
    encoded
      .select(col(idCol).cast("long").as("vec_id"), col("sig"),
        explode(chunks).as("c"))
      .select(col("vec_id"), col("sig"),
        col("c.j").as("j"), col("c.chunk").as("chunk"))
      .repartition(col("j"), col("chunk"))
      .sortWithinPartitions(col("vec_id"))
      .write.partitionBy("j", "chunk").mode("overwrite")
      .parquet(s"$path/index")
    encoded.sparkSession.range(1).select(
        lit(nWords.toLong).as("words"),
        lit(chunkBits.toLong).as("chunk_bits"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** MIH top-k answered from the store: the query's substring values
    * select their (j, chunk) partitions (the filter disjunction is all
    * partition columns, so nothing else ever opens), candidates
    * collapse by id (max(sig) — values are equal per id, max keeps the
    * collapse deterministic, the [[graft.sources.IndexStore]] rule),
    * and the full per-word Hamming runs on candidates only. Result ≡
    * [[Bq.mihTopKWide]] / [[Bq.mihTopK]] on the same signatures. */
  def probe(spark: SparkSession, path: String, querySig: Array[Long],
      k: Int, idCol: String = "vec_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val st = spark.read.parquet(s"$path/stats").head
    val nWords = st.getAs[Long]("words").toInt
    val chunkBits = st.getAs[Long]("chunk_bits").toInt
    require(querySig.length == nWords,
      s"query has ${querySig.length} words, store has $nWords")
    val perWord = 64 / chunkBits
    val mask = (1L << chunkBits) - 1L
    val anyChunk = (0 until nWords * perWord).map { j =>
      val w = j / perWord
      val off = chunkBits * (j % perWord)
      val qc = (querySig(w) >>> off) & mask
      col("j") === lit(j) && col("chunk") === lit(qc)
    }.reduce(_ || _)
    spark.read.parquet(s"$path/index")
      .filter(anyChunk)
      .groupBy(col("vec_id"))
      .agg(max(col("sig")).as("sig"))
      .select(col("vec_id").as(idCol),
        Bq.hammingWordsCol(col("sig"), querySig).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(k)
  }

  /** Batch MIH from the store — [[Bq.mihBatchTopKWide]] answered from
    * the persisted index: the batch's substring values collapse to one
    * distinct (j, chunk) set (bounded by queries × substrings — a
    * serving batch, collected once), whose disjunction prunes the scan
    * to the UNION of all queries' partitions; candidates then match by
    * the (j, chunk) equi-join against the broadcast query substrings,
    * collapse per (query, id), and alone get the per-word Hamming +
    * BottomK top-k. Result ≡ the scan form on the same signatures
    * (BinaryStoreSpec). */
  def probeBatch(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, idCol: String = "vec_id", queryIdCol: String = "query_id",
      querySigCol: String = "qsig"): DataFrame = {
    require(k > 0, "k must be positive")
    val st = spark.read.parquet(s"$path/stats").head
    val nWords = st.getAs[Long]("words").toInt
    val chunkBits = st.getAs[Long]("chunk_bits").toInt
    val perWord = 64 / chunkBits
    val mask = (1L << chunkBits) - 1L
    def chunksOf(sig: org.apache.spark.sql.Column) =
      array((0 until nWords * perWord).map { j =>
        val w = j / perWord
        val off = chunkBits * (j % perWord)
        struct(lit(j).as("j"),
          shiftright(element_at(sig, w + 1), off)
            .bitwiseAND(lit(mask)).as("chunk"))
      }: _*)
    val probes = queries
      .select(col(queryIdCol), col(querySigCol),
        explode(chunksOf(col(querySigCol))).as("c"))
      .select(col(queryIdCol), col(querySigCol),
        col("c.j").as("j"), col("c.chunk").as("chunk"))
      .localCheckpoint(true)
    val pairs = probes.select(col("j"), col("chunk")).distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    require(pairs.nonEmpty, "empty query batch")
    val pruned = spark.read.parquet(s"$path/index")
      .filter(pairs.map { case (j, c) =>
        col("j") === lit(j) && col("chunk") === lit(c)
      }.reduce(_ || _))
    pruned.join(broadcast(probes), Seq("j", "chunk"))
      .groupBy(col(queryIdCol), col("vec_id"))
      .agg(max(col("sig")).as("sig"), max(col(querySigCol)).as("qs"))
      .select(col(queryIdCol), col("vec_id"),
        aggregate(
          zip_with(col("sig"), col("qs"), (a, b) =>
            bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hamming"))
      .groupBy(col(queryIdCol))
      .agg(graft.expressions.BottomK.bottomK(
        col("hamming").cast("double"), col("vec_id"), k).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol),
        col("col.id").as(idCol),
        col("col.distance").cast("long").as("hamming"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
