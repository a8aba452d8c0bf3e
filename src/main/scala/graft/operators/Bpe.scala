package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the tokenizer-TRAINING operator
  * (Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016 §3.2): start from characters, repeat
  * {count adjacent symbol pairs across the corpus → merge the most
  * frequent pair everywhere}. The learned merge list IS the tokenizer;
  * `token_bpe`'s regex segmenter is the apply-side approximation, this
  * is the real training loop over corpus statistics.
  *
  * Scale shape: everything runs on the VOCABULARY (distinct words with
  * corpus counts — one hash groupBy of the token stream, after which
  * data size is vocab-bounded regardless of corpus rows; the classic
  * BPE trick). Per round:
  *  - pair counts: one posexplode of the symbol arrays (vocab × word
  *    length rows), per-word `lead`, one (a, b) aggregation — partial
  *    aggregation collapses map-side;
  *  - the argmax pair (ties: count DESC, then lexicographic (a, b)) is
  *    a 1-row TakeOrdered — the only driver traffic, model-sized;
  *  - the merge applies with WINDOWS, not recursion: greedy
  *    left-to-right non-overlapping matching is only nontrivial when
  *    a = b (for a ≠ b two adjacent matches would force b = a), and
  *    within a run of consecutive match positions greedy keeps exactly
  *    the even offsets — so "match islands" (gaps-and-islands on match
  *    positions) + offset parity reproduce the sequential scan exactly,
  *    in one window pass per round. All windows partition by word —
  *    never a data-cardinality single partition.
  *
  * Symbol arrays are localCheckpointed per round (each round consumes
  * its input twice — the count pass and the apply pass — so the lineage
  * would double per round; the BASELINE.md r9 lesson).
  */
object Bpe {

  /** One learned merge: `a ++ b` became a symbol at `round` (1-based),
    * chosen with corpus pair frequency `cnt`. */
  case class Merge(round: Int, sym_a: String, sym_b: String, cnt: Long)

  /** (w, cnt) vocabulary of a token-array column. */
  def vocab(docs: DataFrame, tokensCol: Column): DataFrame =
    docs.select(explode(tokensCol).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Character-symbol init: (w, cnt, syms). The empty-word guard
    * matters: Spark's `sequence(1, 0)` counts DOWN (the wordShingles
    * lesson) where the oracle's `range(1, 1)` is empty. */
  private def init(vocabDf: DataFrame): DataFrame =
    vocabDf.select(col("w"), col("cnt"),
      when(length(col("w")) < 1, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as("syms"))

  /** Adjacent-pair corpus counts of a (w, cnt, syms) frame: (a, b, c).
    * Overlapping adjacencies all count (the Sennrich statistics). */
  private[operators] def pairCounts(v: DataFrame): DataFrame = {
    val byW = Window.partitionBy(col("w")).orderBy(col("j"))
    v.select(col("cnt"), posexplode(col("syms")).as(Seq("j", "sym")),
        col("w"))
      .select(col("w"), col("cnt"), col("j"), col("sym"),
        lead(col("sym"), 1).over(byW).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Apply merge (a, b) → a++b to every word's symbols — the windowed
    * greedy scan described above. */
  private[operators] def applyMerge(v: DataFrame, a: String, b: String): DataFrame = {
    val byW = Window.partitionBy(col("w")).orderBy(col("j"))
    val byMatch = Window.partitionBy(col("w"), col("ism")).orderBy(col("j"))
    val byIsland = Window.partitionBy(col("w"), col("ism"), col("isl"))
    v.select(col("w"), col("cnt"), posexplode(col("syms")).as(Seq("j", "sym")))
      .select(col("w"), col("cnt"), col("j"), col("sym"),
        (col("sym") === lit(a) &&
          coalesce(lead(col("sym"), 1).over(byW) === lit(b), lit(false)))
          .as("ism"))
      .select(col("*"), (col("j") - row_number().over(byMatch)).as("isl"))
      .select(col("w"), col("cnt"), col("j"), col("sym"),
        (col("ism") &&
          (col("j") - min(col("j")).over(byIsland)) % 2 === 0).as("keepm"))
      .select(col("*"),
        lag(col("keepm"), 1, false).over(byW).as("pk"))
      .filter(!col("pk"))
      .select(col("w"), col("cnt"),
        struct(col("j"),
          when(col("keepm"), lit(a + b)).otherwise(col("sym")).as("out")).as("e"))
      .groupBy(col("w"), col("cnt"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("w"), col("cnt"),
        transform(col("es"), x => x.getField("out")).as("syms"))
  }

  /** Learn `rounds` merges over a (w, cnt) vocabulary. Returns the
    * ordered merge list and the final (w, cnt, syms) segmentation. */
  def learn(spark: SparkSession, vocabDf: DataFrame,
      rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    var v = init(vocabDf).localCheckpoint(true)
    val merges = (1 to rounds).map { r =>
      val best = pairCounts(v)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .collect().headOption
        .getOrElse(throw new IllegalStateException(
          s"round $r: no adjacent pairs left to merge"))
      val m = Merge(r, best.getString(0), best.getString(1), best.getLong(2))
      v = applyMerge(v, m.sym_a, m.sym_b).localCheckpoint(true)
      m
    }
    (merges, v)
  }

  /** The merge table as a DataFrame: (round, sym_a, sym_b, cnt) —
    * value-checks the whole iterative computation (each round's argmax
    * depends on every previous round's corpus-wide application). */
  def learnedMerges(spark: SparkSession, vocabDf: DataFrame,
      rounds: Int): DataFrame = {
    import spark.implicits._
    learn(spark, vocabDf, rounds)._1.toDF()
      .select(col("round"), col("sym_a"), col("sym_b"), col("cnt"))
  }
}
