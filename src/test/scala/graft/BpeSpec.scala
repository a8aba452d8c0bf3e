package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** BPE merge learning: the windowed greedy application equals a
  * sequential reference scan (including the a=b overlap regime), the
  * argmax/tie rule is deterministic, and the learned merges match a
  * full driver-side replay on the real corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: classic BPE (Sennrich 2016 Algorithm 1). */
  private def refLearn(words: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => w.toList.map(_.toString) -> c }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      vocab = vocab.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toList, cnt)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (r, a, b, c)
    }
  }

  test("merges equal the sequential reference on an overlap-stressed vocabulary") {
    // runs of equal chars exercise the a=b greedy parity logic; ties
    // exercise the (count DESC, a, b) rule
    val words = Map(
      "aaaa" -> 5L, "aaab" -> 3L, "baaa" -> 3L, "abab" -> 4L,
      "bbbb" -> 2L, "xyxy" -> 7L, "xxyy" -> 7L, "z" -> 9L)
    val vdf = words.toSeq.toDF("w", "cnt")
    val got = Bpe.learnedMerges(spark, vdf, rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === refLearn(words, 4))
  }

  test("application alone equals the reference scan for an a=b merge") {
    val vdf = Seq(("aaaaa", 1L), ("aa", 1L), ("a", 1L), ("baaab", 1L))
      .toDF("w", "cnt")
    val (merges, fin) = Bpe.learn(spark, vdf, rounds = 1)
    assert(merges.head.sym_a === "a" && merges.head.sym_b === "a")
    val got = fin.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got("aaaaa") === Seq("aa", "aa", "a"))
    assert(got("aa") === Seq("aa"))
    assert(got("a") === Seq("a"))
    assert(got("baaab") === Seq("b", "aa", "a", "b"))
  }

  test("partitioning-invariant and deterministic across runs") {
    val words = (0 until 200).map(i => (s"w${i % 37}x${i % 11}", (i % 7 + 1).toLong))
      .groupMapReduce(_._1)(_._2)(_ + _)
    val one = Bpe.learnedMerges(spark, words.toSeq.toDF("w", "cnt").repartition(1), 3)
      .collect().toSeq
    val many = Bpe.learnedMerges(spark, words.toSeq.toDF("w", "cnt").repartition(13), 3)
      .collect().toSeq
    assert(one === many)
  }

  test("real corpus: learned merges match the driver-side replay") {
    val docs = Tables.documents(spark, sf)
    val vocab = Bpe.vocab(docs, tokens($"text"))
    val words = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.learnedMerges(spark, vocab, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === refLearn(words, 3))
  }
}
