package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.operators.Bm25

/** Persisted inverted index — the index-once / query-many serving path
  * for lexical retrieval. [[graft.operators.Bm25]] tokenizes the corpus
  * per query, which is right for one-off analytics but wrong for a
  * serving tier: at 100 TB the corpus scan IS the cost, and every text
  * index (Lucene most famously) answers queries from persisted postings
  * instead. This store is that idea as a parquet layout:
  *
  *  - `postings/` — (term, doc_id, tf, dl), directory-PARTITIONED by
  *    `b = pmod(xxhash64(term), buckets)` and sorted by term within
  *    files. A query computes its terms' buckets and reads ONLY those
  *    directories (partition pruning — nothing outside ever opens),
  *    then the pushed `term IN (…)` filter skips row groups within the
  *    bucket via the sort's min/max stats. Two pruning levels, both
  *    visible in the scan node.
  *  - `stats/` — one row (n, sumdl, buckets): the corpus constants BM25
  *    needs, broadcast at query time. Document frequencies need NO
  *    table at all — a pruned posting read carries its own df (count of
  *    rows per term).
  *
  * The writer repartitions by bucket then sorts by term within
  * partitions, so each bucket directory holds few, term-clustered files
  * (no small-files blowup, and the min/max stats actually bite).
  * Scoring reuses [[Bm25.scoreFromPostings]] verbatim — IndexStoreSpec
  * pins byte-identical results between the inline and persisted paths.
  */
object IndexStore {

  private def bucketCol(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets.toLong))

  /** (idCol, dl, term, tf, b) for a document batch — shared by the
    * batch writer and the streaming ingest's per-micro-batch write. */
  private def postingsFrame(docs: DataFrame, buckets: Int,
      idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("b", bucketCol(col("term"), buckets))

  /** One stats increment row for a document batch. The stats table is
    * APPEND-ONLY (batch_id −1 for the initial build, the micro-batch id
    * for streamed increments); readers sum the deduped increments, so
    * corpus constants track ingest without rewriting anything. */
  private def statsFrame(docs: DataFrame, buckets: Int, batchId: Long,
      textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n"),
        sum(size(tokens(col(textCol))).cast("long")).as("sumdl"))
      .withColumn("buckets", lit(buckets.toLong))
      .withColumn("batch_id", lit(batchId))

  /** Tokenize once, write postings + stats. Overwrites `path`. */
  def write(docs: DataFrame, path: String, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(buckets >= 1, "buckets must be positive")
    postingsFrame(docs, buckets, idCol, textCol)
      .repartition(col("b"))
      .sortWithinPartitions(col("term"), col(idCol))
      .write.partitionBy("b").mode("overwrite").parquet(s"$path/postings")
    statsFrame(docs, buckets, -1L, textCol)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Streaming index maintenance: a document stream is tokenized,
    * tf-aggregated and bucket-assigned per micro-batch (foreachBatch —
    * batch semantics inside, so the postings rows are IDENTICAL to what
    * the batch writer emits for the same documents), appended into the
    * bucket directories, and the stats table gains one increment row
    * per batch. Newly ingested documents are term-searchable the moment
    * their batch commits — the lexical sibling of
    * [[VectorStore.appendStream]]'s cell-partitioned ingest.
    *
    * Contract: build the store with [[write]] first (fixes the bucket
    * count); delivery is at-least-once on failure replay (the stats
    * reader dedups increments by batch_id; a replayed POSTINGS batch
    * double-appends — compact/rebuild in the quiesced window, the
    * documented lambda split). Assumes batch-disjoint doc ids (append
    * ingest); updates flow through the rebuild path. */
  def appendStream(docStream: DataFrame, path: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docStream.sparkSession
    val buckets = spark.read.parquet(s"$path/stats")
      .head.getAs[Long]("buckets").toInt
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        postingsFrame(batch, buckets, idCol, textCol)
          .repartition(col("b"))
          .sortWithinPartitions(col("term"), col(idCol))
          .write.partitionBy("b").mode("append").parquet(s"$path/postings")
        statsFrame(batch, buckets, batchId, textCol)
          .write.mode("append").parquet(s"$path/stats")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
  }

  /** Corpus constants summed over the deduped increment rows (the
    * initial build plus every committed micro-batch). */
  private def statsAgg(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats")
      .groupBy(col("batch_id"))
      .agg(first(col("n")).as("bn"), first(col("sumdl")).as("bs"),
        first(col("buckets")).as("bb"))
      .agg(sum(col("bn")).as("n"), sum(col("bs")).as("sumdl"),
        max(col("bb")).as("buckets"))

  /** The pruned posting read for a term set: bucket list computed IN
    * THE ENGINE (a |terms|-row job — no driver-side xxhash mirror to
    * drift), then bucket partition pruning + pushed term filter. */
  def postingsFor(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    import spark.implicits._
    val buckets = statsAgg(spark, path).head.getAs[Long]("buckets").toInt
    val bkts = terms.toDF("term")
      .select(bucketCol(col("term"), buckets).as("b"))
      .distinct().collect().map(_.getLong(0))
    spark.read.parquet(s"$path/postings")
      .filter(col("b").isin(bkts: _*) && col("term").isin(terms: _*))
  }

  /** BM25 top-k answered entirely from the persisted index: the corpus
    * is never read, let alone tokenized. */
  def bm25TopK(spark: SparkSession, path: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    val tf = postingsFor(spark, path, terms)
      .select(col(idCol), col("term"), col("dl"), col("tf"))
    val stats = statsAgg(spark, path).select(col("n"), col("sumdl"))
    Bm25.scoreFromPostings(tf, stats, k1, b, idCol)
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }
}
