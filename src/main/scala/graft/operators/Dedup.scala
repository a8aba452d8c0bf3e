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
        md5(concat_ws(":", (0 until rowsPerBand).map(r =>
          element_at(col("minhash_sig"), b * rowsPerBand + r + 1).cast("string")): _*))
          .as("bucket"))
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
    * the shingle sets produced by `shingler` (word n-grams by default;
    * pass char shingles for character-level near-dup).
    * Output (id1, id2, jaccard ≥ threshold), id1 < id2.
    *
    * Scale structure (this is where 100 TB lives or dies):
    *  1. Shingle sets are computed once per doc behind a repartition on
    *     the id — parallelism comes from the cluster, not the input
    *     split count.
    *  2. EXACT-DEDUP BEFORE NEAR-DEDUP: identical shingle sets collapse
    *     to one representative (signature and jaccard are functions of
    *     the set alone, so the final pair set is provably identical to
    *     the naive form — the oracle runs the naive form). Web-scale
    *     corpora are duplicate-heavy; this collapses the quadratic
    *     candidate blowup inside duplicate clusters to a single row.
    *  3. One md5 per shingle (hash32), H families by exact integer
    *     arithmetic (minhashNumeric).
    *  4. Candidates come from an equi-join on (band, bucket) between
    *     representatives — never a quadratic block compare.
    *  5. Verified rep pairs expand back to doc pairs; within-cluster
    *     pairs are jaccard-1.0 by construction. */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 1,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.8,
      shingler: Column => Column = null): DataFrame = {
    val (reps, verified) = minhashRepPairs(docs, textCol, idCol, shingleN,
      numHashes, bands, threshold, shingler)
    val crossPairs = verified
      // 5: expand rep pairs to member pairs (same sets → same jaccard).
      // A repartition between the two explodes parallelizes generation:
      // a 100k-member duplicate cluster would otherwise emit its whole
      // |m1|×|m2| cross product from one task.
      .select(explode(col("m1")).as("a"), col("m2"), col("jaccard"))
      .repartition(col("a"))
      .select(col("a"), explode(col("m2")).as("b"), col("jaccard"))
      .select(least(col("a"), col("b")).as("id1"),
        greatest(col("a"), col("b")).as("id2"), col("jaccard"))
    // within-cluster pairs: identical sets, jaccard exactly 1.0
    val dupPairs = reps.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .repartition(col("a"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a").as("id1"), col("b").as("id2"), lit(1.0).as("jaccard"))
    crossPairs.unionByName(dupPairs)
  }

  /** Shared pipeline: representatives + VERIFIED rep pairs (with member
    * lists), i.e. everything before member-pair expansion.
    * Returns (reps(set_key, rep, members, sh), verified(id1, id2, m1, m2, jaccard)). */
  private def minhashRepPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      shingler: Column => Column): (DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / bands
    val mkShingles: Column => Column = if (shingler != null) shingler else { c =>
      val t = array_distinct(tokens(c))
      if (shingleN == 1) t else array_distinct(wordShingles(t, shingleN))
    }
    // 1-2: shingle once, canonicalize the set, collapse to representatives
    val sh = docs.select(col(idCol).as("id"), mkShingles(col(textCol)).as("sh"))
    val reps = sh
      // \u0001 separator: an unseparated concat could alias distinct sets
      .withColumn("set_key", md5(concat_ws("\u0001", array_sort(col("sh")))))
      .groupBy(col("set_key"))
      .agg(min(col("id")).as("rep"), collect_list(col("id")).as("members"),
        first(col("sh")).as("sh"))
      .repartition(col("rep"))
    // 3: one hash32 per shingle, H numeric families. Persisted: the
    // bucket self-join and both verification joins consume this plan,
    // and exchange reuse does not cover post-exchange projections — the
    // md5/minhash work would otherwise run once per consumer. Rep-level
    // rows are small (one per DISTINCT shingle set).
    val withSig = reps
      .withColumn("hs", transform(col("sh"), (s: Column) => hash32(s)))
      .withColumn("minhash_sig", minhashNumeric(col("hs"), numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 4: LSH candidates between representatives
    val cand = lshCandidates(withSig.select(col("rep").as("id"), col("minhash_sig")),
      "id", bands, rowsPerBand)
    // Two-stage verification: stage 1 joins ONLY the signatures (H longs)
    // and applies the O(H) signature-agreement estimate — nearly every
    // false band collision dies here, so the wide shingle sets never
    // shuffle for them. Stage 2 joins the hashed-distinct shingle sets
    // (cheap long compares; hash collisions deterministic and mirrored by
    // the oracle) for the exact jaccard on the survivors only.
    val repSig = withSig.select(col("rep"), col("minhash_sig"))
    val repSh = withSig.select(col("rep"),
      array_distinct(col("hs")).as("hsd"), col("members"))
    val estFloor = math.max(0.0, threshold - 0.15)
    val survivors = cand
      .join(repSig.select(col("rep").as("id1"), col("minhash_sig").as("sig1")), "id1")
      .join(repSig.select(col("rep").as("id2"), col("minhash_sig").as("sig2")), "id2")
      .withColumn("est",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.expressions.SignatureAgreement(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sig1")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sig2"))))
          .cast("double") / numHashes)
      .filter(col("est") >= estFloor)
      .select(col("id1"), col("id2"))
    val crossPairs = survivors
      .join(repSh.select(col("rep").as("id1"), col("hsd").as("sh1"),
        col("members").as("m1")), "id1")
      .join(repSh.select(col("rep").as("id2"), col("hsd").as("sh2"),
        col("members").as("m2")), "id2")
      // native primitive kernel; value-identical to the array_intersect
      // form (JaccardLongs scaladoc)
      .withColumn("jaccard",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.expressions.JaccardLongs(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sh1")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sh2")))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("m1"), col("m2"), col("jaccard"))
    (reps, crossPairs)
  }

  /** The survivor set of minhash near-dedup WITHOUT materializing the
    * member-pair cross products: per the expansion semantics, the drops
    * of a verified rep pair (A, B) are exactly (members(A) ∪ members(B))
    * minus their minimum — every other member has a smaller partner in
    * some expanded pair — and the drops of a multi-member cluster are its
    * members minus its minimum. Equivalent to
    * `keepList(docs, minhashNearDups(...))` (asserted in DedupSpec) but
    * O(members) instead of O(members²) where duplicate clusters are fat. */
  def minhashKeep(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 1,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.8,
      shingler: Column => Column = null): DataFrame = {
    val (reps, verified) = minhashRepPairs(docs, textCol, idCol, shingleN,
      numHashes, bands, threshold, shingler)
    val pairDrops = verified
      .select(concat(col("m1"), col("m2")).as("mm"))
      .select(explode(col("mm")).as("id"), array_min(col("mm")).as("keep"))
      .filter(col("id") =!= col("keep"))
      .select(col("id"))
    val clusterDrops = reps.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("id"), array_min(col("members")).as("keep"))
      .filter(col("id") =!= col("keep"))
      .select(col("id"))
    docs.join(pairDrops.unionByName(clusterDrops).distinct()
      .withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** The dedup DECISION: which docs survive. Given near-dup pairs with
    * id1 < id2 (any of the pair generators above), drop every id that
    * appears on the id2 side — i.e., keep the lowest id of each
    * duplicate chain reachable by 1+ hops downward. Anti join: one
    * shuffle on the id. (Full connected components would need iteration;
    * the lowest-id-wins rule over pairs is the standard single-pass
    * policy and is what the reference-side oracle can express.) */
  def keepList(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("id2").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

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
      .repartition(col("id"))
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
    // SimHash is a function of the token SET, so identical sets collapse
    // to one representative (exact-dedup-before-near-dedup, as in
    // minhashNearDups): duplicate-heavy corpora would otherwise put whole
    // clusters into one block and go quadratic. Token hashes are
    // materialized behind the exchange so md5 runs once per token, not
    // once per simhash bit.
    val reps = docs.select(col(idCol).as("id"),
        array_sort(array_distinct(tokens(col(textCol)))).as("tok"))
      .groupBy(col("tok"))
      .agg(min(col("id")).as("rep"), collect_list(col("id")).as("members"))
      .repartition(col("rep"))
      .withColumn("hs", transform(col("tok"), (s: Column) => hash32(s)))
    // persisted: both sides of the block self-join consume this plan and
    // would otherwise recompute the 32-bit vote per side
    val sh = reps.select(col("rep"), col("members"),
        simhash32FromHashes(col("hs")).as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocked = sh.withColumn("blk",
      floor(col("simhash") / pow(lit(2.0), lit(32 - blockBits))).cast("long"))
    val a = blocked.as("a"); val b = blocked.as("b")
    // cross-representative pairs (hamming of identical sets is 0, so
    // within-cluster pairs are emitted separately below)
    val crossPairs = a.join(b,
        col("a.blk") === col("b.blk") && col("a.rep") < col("b.rep"))
      .withColumn("hamming", hamming(col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= maxHamming)
      .select(explode(col("a.members")).as("x"), col("b.members").as("mb"), col("hamming"))
      .repartition(col("x")) // parallelize the second explode (see minhashNearDups)
      .select(col("x"), explode(col("mb")).as("y"), col("hamming"))
      .select(least(col("x"), col("y")).as("id1"),
        greatest(col("x"), col("y")).as("id2"), col("hamming"))
    val dupPairs = reps.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("x"), col("members"))
      .repartition(col("x"))
      .select(col("x"), explode(col("members")).as("y"))
      .filter(col("x") < col("y"))
      .select(col("x").as("id1"), col("y").as("id2"), lit(0L).as("hamming"))
    crossPairs.unionByName(dupPairs)
  }

  /** Embedding-cosine/L2 near-duplicate pairs, exact within blocks. */
  def embeddingNearDups(
      vectors: DataFrame,
      blockCol: Column,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxL2Sq: Double = 1.45): DataFrame = {
    val t = vectors.select(col(idCol).as("id"), blockCol.as("blk"), col(embCol).as("e"))
      .repartition(col("id"))
    val a = t.as("a"); val b = t.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("distance", l2sq(col("a.e"), col("b.e")))
      .filter(col("distance") < maxL2Sq)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("distance"))
  }
}
