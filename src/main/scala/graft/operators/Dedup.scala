package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines (north star).
  *
  * Scale design (the whole point — 100 TB of documents):
  *  - Exact dedup: hash-groupBy on a digest of normalized text. One
  *    shuffle on a 16-byte key, never on the text itself.
  *  - MinHash/LSH: signature → band buckets → equi-join on
  *    (band, bucket). The candidate join is an EQUI join, so Catalyst
  *    shuffles on the bucket key — no quadratic comparison ever
  *    materializes; the exact jaccard verification runs only on
  *    candidates. Band/row counts trade recall vs candidate volume:
  *    P(candidate) = 1 - (1 - j^r)^b.
  *  - SimHash: one 32-bit sketch per doc; near-dup = small hamming
  *    distance, candidates blocked on the high bits.
  *  - Embedding near-dup: exact within blocks (here: label; generally:
  *    any coarse quantization/IVF cell) — the blocked-exact baseline the
  *    Ann LSH path approximates.
  */
object Dedup {

  /** Exact duplicates of normalized text: keep the lowest id per group.
    * Returns (kept id, n_copies, content_hash). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), contentHash(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Attach a MinHash signature over word `n`-gram shingles. */
  def withMinhash(docs: DataFrame, textCol: String, n: Int, numHashes: Int): DataFrame = {
    val tok = array_distinct(tokens(col(textCol)))
    val sh = if (n == 1) tok else array_distinct(wordShingles(tok, n))
    docs.withColumn("minhash_sig", minhashSignature(sh, numHashes))
  }

  /** LSH candidate pairs from a signature column: `bands` bands of
    * `rowsPerBand` signature elements; pair = same digest in any band.
    * Output: (id1, id2) with id1 < id2, distinct. */
  def lshCandidates(
      withSig: DataFrame,
      idCol: String,
      bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("", (0 until rowsPerBand).map(r =>
          element_at(col("minhash_sig"), b * rowsPerBand + r + 1)): _*)).as("bucket"))
    }: _*)
    val buckets = withSig
      .select(col(idCol).as("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** MinHash+LSH near-duplicate pairs with exact jaccard verification on
    * word n-gram shingle sets. Output (id1, id2, jaccard ≥ threshold). */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 1,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = withMinhash(docs, textCol, shingleN, numHashes)
    val cand = lshCandidates(withSig, idCol, bands, rowsPerBand)
    val tok = docs.select(col(idCol).as("id"),
      { val t = array_distinct(tokens(col(textCol)))
        (if (shingleN == 1) t else array_distinct(wordShingles(t, shingleN))).as("sh") })
    cand
      .join(tok.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(tok.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** All-pairs word-shingle jaccard within a blocking key (exact n-gram
    * Jaccard dedup; the blocked-quadratic baseline LSH approximates). */
  def jaccardPairsBlocked(
      docs: DataFrame,
      blockCol: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      threshold: Double = 0.8): DataFrame = {
    val t = docs.select(col(idCol).as("id"), blockCol.as("blk"),
      array_distinct(tokens(col(textCol))).as("sh"))
    val a = t.as("a"); val b = t.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccard(col("a.sh"), col("b.sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: candidates blocked on the top
    * `blockBits` bits, verified by hamming distance ≤ maxHamming. */
  def simhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 6,
      blockBits: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      simhash32(array_distinct(tokens(col(textCol)))).as("simhash"))
    val blocked = sh.withColumn("blk",
      floor(col("simhash") / pow(lit(2.0), lit(32 - blockBits))).cast("long"))
    val a = blocked.as("a"); val b = blocked.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("hamming", hamming(col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("hamming"))
  }

  /** Embedding-cosine/L2 near-duplicate pairs, exact within blocks. */
  def embeddingNearDups(
      vectors: DataFrame,
      blockCol: Column,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxL2Sq: Double = 1.45): DataFrame = {
    val t = vectors.select(col(idCol).as("id"), blockCol.as("blk"), col(embCol).as("e"))
    val a = t.as("a"); val b = t.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("distance", l2sq(col("a.e"), col("b.e")))
      .filter(col("distance") < maxL2Sq)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("distance"))
  }
}
