package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.TypedApi
import graft.TypedApi.{VectorPoint, ScoredPoint}

class SkewAndTypedSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain join (hot key included)") {
    val large = (1 to 1000).map(i => (if (i % 2 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("key", "tag")
    val plain = large.join(small, "key").select("key", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(large, small, "key", col("v"), buckets = 8)
      .select("key", "v", "tag").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.count(_.head == "hot") === 500)
  }

  test("salted collect_list gathers all values per key") {
    val df = (1 to 100).map(i => ("hot", i.toLong)).toDF("key", "v")
    val got = SkewJoin.saltedCollectList(df, "key", "v", col("v"), buckets = 4)
      .head()
    assert(got.getString(0) === "hot")
    assert(got.getSeq[Long](1).sorted === (1L to 100L))
  }

  test("typed knn returns ScoredPoint with shard, squared-L2, ordered") {
    implicit val s = spark
    val pts = Seq(
      VectorPoint(1, Seq(0f, 0f), "s0"), VectorPoint(2, Seq(1f, 0f), "s1"),
      VectorPoint(3, Seq(2f, 2f), "s0")).toDS()
    val hits = TypedApi.knn(pts, Seq(0f, 0f), 2).collect()
    assert(hits.toSeq === Seq(
      ScoredPoint(1, 0.0, "s0"), ScoredPoint(2, 1.0, "s1")))
  }

  test("typed knn k=0 returns empty (reference parity)") {
    implicit val s = spark
    val pts = Seq(VectorPoint(1, Seq(0f), "s0")).toDS()
    assert(TypedApi.knn(pts, Seq(0f), 0).count() === 0)
  }
}
