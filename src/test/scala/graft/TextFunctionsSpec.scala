package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String = "x") = {
    Seq(text).toDF("text").select(c.as("v")).head()
  }

  test("normText lowercases, collapses whitespace, trims") {
    assert(one(normText($"text"), "  Hello   WORLD  ").getString(0) === "hello world")
  }

  test("tokenCount counts whitespace tokens after normalization") {
    assert(one(tokenCount($"text"), "a  b\tc\nd").getLong(0) === 4L)
  }

  test("wordShingles produces n-grams; short input gives empty") {
    val sh = one(wordShingles(tokens($"text"), 2), "a b c").getSeq[String](0)
    assert(sh === Seq("a b", "b c"))
    assert(one(wordShingles(tokens($"text"), 5), "a b").getSeq[String](0).isEmpty)
  }

  test("charShingles 4-grams") {
    assert(one(charShingles($"text", 4), "abcde").getSeq[String](0) === Seq("abcd", "bcde"))
  }

  test("hash32 matches the oracle's exact fold (value pinned)") {
    // DuckDB: first 8 nibbles of md5('hello') = 1564557354
    assert(one(hash32($"text"), "hello").getLong(0) === 1564557354L)
    assert(one(hash32Hof($"text"), "hello").getLong(0) === 1564557354L)
  }

  test("hash32 native ≡ hex-parse spec on random strings incl. unicode/empty") {
    val rnd = new scala.util.Random(3)
    val strs = (0 until 60).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(20)).mkString) ++ Seq("", "ααβ δ", "日本語", " ")
    strs.toDF("s").select(hash32($"s").as("a"), hash32Hof($"s").as("b"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("simhash32 is deterministic and within 32 bits") {
    val a = one(simhash32(distinctTokens($"text")), "the quick brown fox").getLong(0)
    val b = one(simhash32(distinctTokens($"text")), "the quick brown fox").getLong(0)
    assert(a === b)
    assert(a >= 0 && a < (1L << 32))
  }

  test("hamming distance of equal hashes is 0, differs by set bits") {
    val df = Seq((5L, 6L)).toDF("a", "b")
      .select(hamming($"a", $"a").as("h0"), hamming($"a", $"b").as("h1"))
    val r = df.head()
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 2L) // 101 vs 110
  }

  test("langIdHeuristic: stopword languages + cjk + und") {
    val got = Seq(
      "the cat and the dog is in a house",
      "el perro y la casa es un lugar con luz",
      "der hund und die katze ist von dem haus",
      "le chat et les chiens est une affaire du jour",
      "你好 世界",
      "zzz qqq xxx"
    ).toDF("text").select(langIdHeuristic($"text").as("l")).collect().map(_.getString(0))
    assert(got === Array("en", "es", "de", "fr", "zh", "und"))
  }

  test("qualityScore in [0,1]; degenerate text scores lower") {
    val q = Seq(
      "The quick brown fox jumps over the lazy dog near the quiet river bank today",
      "aaa aaa aaa aaa aaa aaa aaa aaa"
    ).toDF("text").select(qualityScore($"text").as("q")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("contentHash invariant to case and whitespace") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
      .select(contentHash($"a").as("ha"), contentHash($"b").as("hb")).head()
    assert(df.getString(0) === df.getString(1))
  }

  test("minhashFamilies (native) ≡ minhashNumeric (HOF spec) incl. empty") {
    val df = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("lorem", "ipsum"),
      Seq.empty[String]
    ).toDF("sh").withColumn("hs", transform($"sh", (s: Column) => hash32(s)))
    val got = df.select(
      minhashFamilies($"hs", 12).as("native"),
      minhashNumeric($"hs", 12).as("spec")).collect()
    got.foreach { r => assert(r.getSeq[Any](0) === r.getSeq[Any](1)) }
  }

  test("ngramHashes (fused) ≡ hash32 over distinct charShingles (spec)") {
    val df = Seq("the quick brown fox", "ab", "aaaa", "ααββγγ δδ")
      .toDF("text").select(
        ngramHashes($"text", 4).as("fused"),
        transform(array_distinct(charShingles($"text", 4)),
          (s: Column) => hash32(s)).as("spec"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
      // spec path has string-distinct shingles; absent hash collisions
      // the long sets are the same size too
      assert(r.getSeq[Long](0).size === r.getSeq[Long](1).toSet.size)
    }
  }

  test("simhash32Native ≡ simhash32FromHashes (HOF spec) incl. empty") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map(_ =>
      Tuple1(Seq.fill(rnd.nextInt(40))(rnd.nextLong(1L << 32)))) :+ Tuple1(Seq.empty[Long])
    rows.toDF("hs")
      .select(simhash32Native($"hs").as("a"), simhash32FromHashes($"hs").as("b"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("hash56 native ≡ hash56Hof (conv spec), 56-bit range") {
    val texts = Seq("", "a", "the quick brown fox", "päivää", "苹果").map(Tuple1(_))
    texts.toDF("s")
      .select(hash56($"s").as("a"), hash56Hof($"s").as("b")).collect()
      .foreach { r =>
        assert(r.getLong(0) === r.getLong(1))
        assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 56))
      }
  }

  test("simhashNative(·, 56) ≡ simhashBitsFromHashes HOF spec incl. empty") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 50).map(_ =>
      Tuple1(Seq.fill(rnd.nextInt(40))(rnd.nextLong(1L << 56)))) :+ Tuple1(Seq.empty[Long])
    rows.toDF("hs")
      .select(simhashNative($"hs", 56).as("a"),
        simhashBitsFromHashes($"hs", 56).as("b"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("setFingerprint native ≡ HOF spec for long and string arrays") {
    val rnd = new scala.util.Random(31)
    val longRows = (0 until 30).map(_ =>
      Tuple1(Seq.fill(rnd.nextInt(30))(rnd.nextLong()))) :+ Tuple1(Seq.empty[Long])
    longRows.toDF("a")
      .select(setFingerprint($"a").as("x"), setFingerprintHof($"a").as("y"))
      .collect().foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
    val strRows = (0 until 30).map(_ =>
      Tuple1(Seq.fill(rnd.nextInt(10))(rnd.nextString(6)))) :+ Tuple1(Seq.empty[String])
    strRows.toDF("a")
      .select(setFingerprint($"a").as("x"), setFingerprintHof($"a").as("y"))
      .collect().foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
  }

  test("bpeTokens splits letter/digit/punct runs with space prefixes") {
    val got = Seq("Hello world42, ok!").toDF("text")
      .select(bpeTokens($"text").as("t")).head().getSeq[String](0)
    assert(got === Seq("Hello", " world", "42", ",", " ok", "!"))
  }

  test("winnowFingerprints native ≡ HOF spec (order and values)") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcde "
    val texts = (0 until 30).map(_ =>
      Tuple1((0 until rnd.nextInt(60)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)) ++
      Seq(Tuple1(""), Tuple1("abc"), Tuple1("abcd"), Tuple1("abcdefgh"), Tuple1("aaaaaaaaaa"))
    texts.toDF("s")
      .select(winnowFingerprints($"s", 5, 4).as("a"),
        winnowFingerprintsHof($"s", 5, 4).as("b"))
      .collect().foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("winnowing: docs sharing a substring ≥ k+w-1 share a fingerprint") {
    val k = 5; val w = 4
    val df = Seq(
      (1L, "aaaa SHARED-RUN-OF-TEXT zzzz"),
      (2L, "bbbb cccc SHARED-RUN-OF-TEXT dddd"),
      (3L, "completely unrelated content here"),
      (4L, "abc") // shorter than k → empty fingerprint set
    ).toDF("id", "text")
      .select($"id", winnowFingerprints($"text", k, w).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((df(1L) & df(2L)).nonEmpty)   // shared run ≥ k+w-1 chars
    assert((df(1L) & df(3L)).isEmpty)
    assert(df(4L).isEmpty)
  }

  test("chunkTokens: coverage, overlap, short-doc, and boundary behavior") {
    val doc = (1 to 100).map(i => s"t$i").mkString(" ")
    val got = Seq((1L, doc), (2L, "short doc"), (3L, ""))
      .toDF("id", "text")
      .select($"id", chunkTokens($"text", 64, 16).as("ch")).collect()
      .map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[String]](1)).toMap
    // 100 tokens, stride 48: chunks at 1..64 and 49..100 → 2 chunks
    assert(got(1L).length === 2)
    assert(got(1L)(0).length === 64 && got(1L)(0).head === "t1" && got(1L)(0).last === "t64")
    assert(got(1L)(1).length === 52 && got(1L)(1).head === "t49" && got(1L)(1).last === "t100")
    // consecutive chunks share exactly the overlap tokens
    assert(got(1L)(0).toSet.intersect(got(1L)(1).toSet).size === 16)
    // every token is covered
    assert(got(1L).flatten.toSet.size === 100)
    // shorter than one window → a single short chunk; empty text → one
    // chunk of the single empty token (tokens('') = [""])
    assert(got(2L) === Seq(Seq("short", "doc")))
    assert(got(3L).length === 1)
  }

  test("stratifiedKeep: deterministic, per-stratum rates, unlisted strata whole") {
    val docs = (0L until 400L).map(i =>
      (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "es" else "de"))
      .toDF("doc_id", "lang")
    val keep = stratifiedKeep($"lang", $"doc_id",
      Map("en" -> 4, "es" -> 2), outOf = 8, salt = "mix")
    val kept = docs.filter(keep).collect().map(r => (r.getLong(0), r.getString(1)))
    // unlisted stratum survives whole
    assert(kept.count(_._2 == "de") === 200)
    // listed strata thin to ≈ their rate (hash-uniform, ±binomial noise)
    val en = kept.count(_._2 == "en"); val es = kept.count(_._2 == "es")
    assert(en > 30 && en < 70, s"en=$en of 100 at rate 1/2")
    assert(es > 10 && es < 40, s"es=$es of 100 at rate 1/4")
    // deterministic: the same predicate keeps the same rows again
    val again = docs.filter(keep).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSeq === again.toSeq)
  }

  test("charEntropyQ: engine == driver replay; edges behave") {
    val docs = Seq(
      (1L, "aaaa"),            // one symbol → entropy 0
      (2L, "abab"),            // two equiprobable → ln 2 per char
      (3L, ""),                // empty → 0 by definition
      (4L, "the quick brown fox"))
    .toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", normText($"text").as("norm"))
      .select($"doc_id", $"norm", charsOf($"norm").as("chars"))
      .select($"doc_id", $"norm", charEntropyQ($"chars").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // BigDecimal HALF_UP mirrors Spark's round exactly (math.round is
    // floor(x+0.5), which drifts on FP edges — Pq.lut scaladoc)
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def replay(s: String): Long =
      if (s.isEmpty) 0L
      else s.distinct.map { c =>
        val p = s.count(_ == c).toDouble / s.length
        q(-(p * math.log(p)) * 1e6)
      }.sum
    got.foreach { case (id, norm, h) =>
      assert(h === replay(norm), s"doc $id")
    }
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId(1L) === 0L)
    assert(byId(3L) === 0L)
    // "abab": Σ over 2 chars of round(0.5·ln2·1e6) = 2 × 346574
    assert(byId(2L) === 2L * q(0.5 * math.log(2) * 1e6))
    assert(byId(4L) > byId(2L), "richer alphabet → higher entropy")
  }

  test("CharEntropyQ static: unicode code points count like substring chars") {
    import org.apache.spark.unsafe.types.UTF8String
    // 2-char string over a surrogate-pair alphabet: p = 0.5 each
    val s = "😀😁"
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = 2L * q(0.5 * math.log(2) * 1e6)
    assert(graft.expressions.CharEntropyQ.entropyQ(
      UTF8String.fromString(s)) === expected)
    assert(graft.expressions.CharEntropyQ.entropyQ(
      UTF8String.fromString("")) === 0L)
  }

  test("Quality.repetitionStats (relational) ≡ nested-HOF form on testdata") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val topBigram = coalesce(
      array_max(transform(array_distinct($"sh2"),
        d => size(filter($"sh2", x => x === d)))), lit(0))
    val onceOnly = size(filter(array_distinct($"sh3"),
      d => size(filter($"sh3", x => x === d)) === 1))
    val hof = docs
      .select($"doc_id", tokens($"text").as("tok"))
      .select($"doc_id", $"tok",
        wordShingles($"tok", 2).as("sh2"), wordShingles($"tok", 3).as("sh3"))
      .select($"doc_id",
        size($"tok").cast("long").as("n_tok"),
        round(topBigram.cast("double") / greatest(size($"sh2"), lit(1)), 6)
          .as("top2_frac"),
        round((size($"sh3") - onceOnly).cast("double") /
          greatest(size($"sh3"), lit(1)), 6).as("dup3_frac"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rel = graft.operators.Quality.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rel === hof)
    spark.catalog.clearCache()
    // short-doc edges: no bigrams/trigrams → 0.0 fractions survive
    val edge = graft.operators.Quality.repetitionStats(
        Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(edge === Set((1L, 0.0, 0.0), (2L, 1.0, 0.0)))
    spark.catalog.clearCache()
  }

  test("Quality.charEntropy (native kernel) ≡ charEntropyQ HOF kernel on testdata") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val kernel = docs
      .select($"doc_id", normText($"text").as("norm"))
      .select($"doc_id", charsOf($"norm").as("chars"))
      .select($"doc_id", charEntropyQ($"chars").as("entropy_q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = graft.operators.Quality.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relational === kernel)
    spark.catalog.clearCache()
    // empty-text doc flows through the left join as 0
    val edge = graft.operators.Quality.charEntropy(
        Seq((9L, ""), (10L, "ab")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge(9L) === 0L && edge(10L) > 0L)
    spark.catalog.clearCache()
  }

  test("setFingerprint is order-independent and set-discriminating") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "a", "b")),   // same set, different order
      (3L, Seq("a", "b", "d"))    // different set
    ).toDF("id", "sh").select($"id", setFingerprint($"sh").as("k")).collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(df(1L) === df(2L))
    assert(df(1L) !== df(3L))
  }
}
