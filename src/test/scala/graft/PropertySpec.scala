package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Knn, MutationLog}

/** Property-based invariants (SURVEY.md §5.3):
  *  (a) distributed top-k ≡ global sort-take-k, for any partitioning;
  *  (b) log replay is partitioning-insensitive but log_index-sensitive;
  *  (c) upsert-then-delete annihilates.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (scalatestplus bridge is not a
    * dependency; generators are driven directly with fixed seeds). */
  private def samples[A](gen: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.choose(0, 40)
    ids <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-8f, 8f)))
  } yield ids.zip(vecs)

  test("(a) topK(xs, k) == sort(xs).take(k) under any partitioning") {
    samples(for { xs <- vecGen; k <- Gen.choose(0, 12); p <- Gen.choose(1, 7) } yield (xs, k, p))
      .foreach { case (xs, k, parts) =>
        val df = xs.toDF("vec_id", "embedding").repartition(parts)
        val got = Knn.topK(df, Seq(0f, 0f, 0f, 0f), k)
          .collect().map(r => (r.getDouble(1), r.getLong(0))).toList
        val expected = xs
          .map { case (id, v) => (v.map(x => x.toDouble * x).sum, id) }
          .sorted.take(k)
        // compare with tolerance-free double equality: both sides fold
        // float->double squares; order of per-element ops is identical
        assert(got.map(_._2) === expected.map(_._2))
      }
  }

  private val logGen: Gen[List[(Long, String, Long, String)]] = for {
    n <- Gen.choose(0, 30)
    entries <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 5L)
      shard <- Gen.oneOf("s0", "s1")
      op <- Gen.oneOf("UPSERT", "DELETE")
    } yield (id, shard, op))
  } yield entries.zipWithIndex.map { case ((id, sh, op), i) => (i.toLong, op, id, sh) }

  /** Sequential-fold model: a key survives iff its highest-log_index
    * entry is an UPSERT. */
  private def replayReference(log: List[(Long, String, Long, String)]): Set[(Long, String)] =
    // .toList before collect: Map.collect with pair-typed results would
    // rebuild a Map and silently dedup by the first tuple element
    log.groupBy(e => (e._3, e._4)).toList
      .collect { case (key, entries) if entries.maxBy(_._1)._2 == "UPSERT" => key }
      .toSet

  test("(d) JaccardSortedLongs ≡ JaccardLongs on random sorted distinct sets") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val setGen = Gen.listOf(Gen.choose(0L, 200L)).map(_.distinct.sorted)
    samples(for { a <- setGen; b <- setGen } yield (a, b), n = 30).foreach { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b").select(
        column(graft.expressions.JaccardSortedLongs(expression($"a"), expression($"b"))).as("m"),
        column(graft.expressions.JaccardLongs(expression($"a"), expression($"b"))).as("n")).head()
      assert(r.getDouble(0) === r.getDouble(1), s"a=$a b=$b")
    }
  }

  test("(e) MinHashFamilies ≡ minhashNumeric on random 32-bit hash arrays") {
    import graft.functions.TextFunctions.{minhashFamilies, minhashNumeric}
    val hsGen = Gen.listOf(Gen.choose(0L, (1L << 32) - 1))
    samples(for { hs <- hsGen; h <- Gen.choose(1, 48) } yield (hs, h), n = 20)
      .foreach { case (hs, h) =>
        val r = Seq(Tuple1(hs)).toDF("hs").select(
          minhashFamilies($"hs", h).as("a"), minhashNumeric($"hs", h).as("b")).head()
        assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"hs=$hs h=$h")
      }
  }

  test("(b) replay ≡ sequential fold, insensitive to partitioning") {
    samples(for { l <- logGen; p <- Gen.choose(1, 5) } yield (l, p))
      .foreach { case (log, parts) =>
        val df = log.map { case (i, op, id, sh) => (i, op, id, sh, Seq(1f)) }
          .toDF("log_index", "op", "id", "shard_id", "embedding")
          .repartition(parts)
        val got = MutationLog.replay(df)
          .select("id", "shard_id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === replayReference(log))
      }
  }

  test("(b') compact(log, cut) replays identically for any cut") {
    samples(for { l <- logGen; c <- Gen.choose(0L, 30L) } yield (l, c), 8)
      .foreach { case (log, cut) =>
        if (log.nonEmpty) {
          val df = log.map { case (i, op, id, sh) => (i, op, id, sh, Seq(1f)) }
            .toDF("log_index", "op", "id", "shard_id", "embedding")
          val direct = MutationLog.replay(df)
            .select("id", "shard_id").collect().map(_.toSeq).toSet
          val compacted = MutationLog.replay(MutationLog.compact(df, cut))
            .select("id", "shard_id").collect().map(_.toSeq).toSet
          assert(compacted === direct)
        }
      }
  }

  test("(c) trailing upsert+delete of v excludes v; trailing upsert includes it") {
    samples(logGen, 8).foreach { log =>
      val base = log.length.toLong
      val extended = log ++ List(
        (base, "UPSERT", 99L, "s0"), (base + 1, "DELETE", 99L, "s0"),
        (base + 2, "UPSERT", 98L, "s0"))
      val df = extended.map { case (i, op, id, sh) => (i, op, id, sh, Seq(1f)) }
        .toDF("log_index", "op", "id", "shard_id", "embedding")
      val ids = MutationLog.replay(df).select("id").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(99L))
      assert(ids.contains(98L))
    }
  }

  test("(f) RANGE-frame trailing sum ≡ naive per-row filter, ROWS-insensitive") {
    // random (user, sec, value) rows with DELIBERATE equal-sec peers:
    // the RANGE frame must include every peer's value no matter the
    // row order, where a ROWS frame would depend on it
    val rowGen: Gen[List[(Long, Long, Int)]] = for {
      n <- Gen.choose(1, 60)
      us <- Gen.listOfN(n, Gen.choose(0L, 4L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 40L))
      vs <- Gen.listOfN(n, Gen.choose(0, 500))
    } yield us.lazyZip(ts).lazyZip(vs).toList
    samples(rowGen, 8).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, sec, v), i) => (i.toLong, u, sec, v.toLong) }
        .toDF("row_id", "u", "sec", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"u").orderBy($"sec")
        .rangeBetween(-10, org.apache.spark.sql.expressions.Window.currentRow)
      val got = df.withColumn("trail",
          org.apache.spark.sql.functions.sum($"v").over(w))
        .select($"row_id", $"trail").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.zipWithIndex.foreach { case ((u, sec, _), i) =>
        val expected = rows
          .filter { case (u2, s2, _) => u2 == u && s2 >= sec - 10 && s2 <= sec }
          .map(_._3.toLong).sum
        assert(got(i.toLong) === expected, s"row $i")
      }
    }
  }

  test("(g) labelPropagate is partitioning-invariant (synchronous rounds)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val g = graft.operators.KnnGraph.build(e, m = 3)
      .select($"vec_id".as("src"), $"nbr_id".as("dst"))
      .localCheckpoint(true)
    val nodes = e.select($"vec_id").distinct()
    val a = graft.operators.KnnGraph
      .labelPropagate(nodes.repartition(1), g.repartition(1), rounds = 2)
      .orderBy($"vec_id").collect().toSeq
    val b = graft.operators.KnnGraph
      .labelPropagate(nodes.repartition(13), g.repartition(13), rounds = 2)
      .orderBy($"vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    spark.catalog.clearCache()
  }
}
