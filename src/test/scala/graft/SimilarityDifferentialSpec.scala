package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Bpe, SetJoin, SimJoin}

/** Randomized differential tests for the three exact similarity/training
  * operators against direct driver-side implementations of the same
  * algorithm definitions (the DedupDifferentialSpec convention): random
  * near-duplicate-rich string populations for PassJoin, random small-
  * universe token sets for the prefix-filter join, random vocabularies
  * for BPE. Any divergence in the distributed rewrites (collapse,
  * pigeonhole candidates, windowed greedy merge) shows up as a set
  * difference. */
class SimilarityDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("PassJoin: random mutation-heavy populations equal the quadratic truth") {
    // base words + random 1-2 edit mutations of them → dense near-dup
    // structure with many boundary-distance pairs
    val alphabet = "ab1"
    val base = samples(for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(alphabet.toSeq))
    } yield cs.mkString, 30, 7000L)
    val mutated = samples(for {
      w <- Gen.oneOf(base)
      op <- Gen.oneOf("sub", "ins", "del")
      p <- Gen.choose(0, math.max(0, w.length - 1))
      c <- Gen.oneOf(alphabet.toSeq)
    } yield op match {
      case "sub" if w.nonEmpty => w.updated(p, c)
      case "ins" => w.take(p) + c + w.drop(p)
      case _ if w.nonEmpty => w.take(p) + w.drop(p + 1)
      case _ => w
    }, 60, 8000L)
    val pop = (base ++ mutated).filter(_.nonEmpty)
    for (k <- Seq(1, 2)) {
      val distinct = pop.distinct
      val got = SimJoin.editPairs(distinct.toDF("s"), k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val want = (for {
        a <- distinct; b <- distinct if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got === want, s"k=$k over ${distinct.size} strings")
      assert(want.nonEmpty, "generator should produce near-dup pairs")
    }
  }

  test("prefix-filter Jaccard: random small-universe sets equal the quadratic truth") {
    val universe = (0 until 30).map(i => s"tok$i")
    val setsGen = for {
      n <- Gen.choose(1, 12)
      ts <- Gen.listOfN(n, Gen.oneOf(universe))
    } yield ts.distinct
    val rows = samples(setsGen, 80, 9000L).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "tk")
    for ((num, den) <- Seq((1, 3), (1, 2), (3, 5), (9, 10), (1, 1))) {
      val got = SetJoin.jaccardPairs(df, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        (i, a) <- rows; (j, b) <- rows if i < j
        in = (a.toSet & b.toSet).size.toLong
        un = (a.toSet | b.toSet).size.toLong
        if in * den >= un * num
      } yield (i, j, in, un)).toSet
      assert(got === want, s"t=$num/$den")
    }
  }

  test("BPE: random vocabularies equal the sequential reference across rounds") {
    val wordGen = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf("aabbc".toSeq)) // rep-heavy: a=b islands
    } yield cs.mkString
    val words = samples(wordGen, 60, 10000L)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    def refLearn(ws: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Map[List[String], Long] =
        ws.map { case (w, c) => w.toList.map(_.toString) -> c }
      (1 to rounds).map { r =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
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
    val got = Bpe.learnedMerges(spark, words.toSeq.toDF("w", "cnt"), rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === refLearn(words, 5))
  }
}
