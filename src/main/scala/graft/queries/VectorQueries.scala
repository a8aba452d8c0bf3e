package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions._
import graft.operators.Knn
import graft.sources.Tables

/** The reference's core surface: exact k-NN search (SURVEY.md §2 O-1/O-2/O-3)
  * plus cosine variants and vector statistics.
  *
  * All query vectors are taken FROM the table (vec_id 0 / vec_id < 8) so
  * the engine and the DuckDB oracle score bit-identical float inputs.
  */
object VectorQueries extends QueryPack {

  /** DuckDB squared-L2 fragment matching VectorFunctions.l2sq exactly:
    * double widening, element-order left fold. */
  def duckL2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** DuckDB dot-product fragment matching VectorFunctions.dot. */
  def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O-1/O-2: exact squared-L2 top-k, single query. Catalyst plans
    // TakeOrderedAndProject = per-partition bounded-heap top-k + driver
    // merge — the reference's shard fan-out/merge, distributed.
    "knn_single" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.crossJoin(broadcast(q))
        .select($"vec_id", round(l2sq($"embedding", $"qvec"), 4).as("distance"))
        .orderBy($"distance", $"vec_id")
        .limit(10)
    }),

    // O-3: batch search — the query set is data; one scan serves all.
    "knn_batch" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      Knn.batchTopK(e, q, k = 5)
        .select($"query_id", $"vec_id",
          round($"distance", 4).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // Tenant-scoped batch search (namespace isolation): each of 8
    // queries sees ONLY its tenant's quarter of the corpus (tenant =
    // vec_id mod 4) — the group equi-join replaces the batch cross
    // join, so foreign-tenant rows drop at the join instead of being
    // scored and discarded.
    "knn_grouped" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .withColumn("tenant", pmod($"vec_id", lit(4L)))
      val q = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"), $"tenant")
      Knn.groupedTopK(e, q, k = 3, groupCol = "tenant")
        .select($"query_id", $"vec_id",
          round($"distance", 4).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // The beyond-broadcast batch path, oracle-checked: maxChunk=3 forces
    // the 8-query batch through 3 hash-split chunks (each its own
    // broadcast join + BottomK pass over the vectors) — semantically
    // invisible, so the oracle is the same plain batch SQL.
    "knn_batch_chunked" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      Knn.batchTopKChunked(e, q, k = 5, maxChunk = 3)
        .select($"query_id", $"vec_id",
          round($"distance", 4).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // Explicit duplicate-id resolution (SURVEY §7 risk 4): the corpus is
    // the embeddings table PLUS a re-sharded copy of every 10th vector,
    // so those ids genuinely appear twice — the reference's shard merge
    // would return them once per shard (`shard_manager.cc:129-145`, the
    // quirk the core ops preserve). dedupById keeps each id's best hit
    // and re-ranks densely; the oracle replays raw-top-k → min-per-id →
    // re-rank.
    "knn_dedup" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val corpus = e.select($"vec_id", $"embedding")
        .unionByName(e.filter($"vec_id" % 10 === 0).select($"vec_id", $"embedding"))
      val q = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      Knn.dedupById(Knn.batchTopK(corpus, q, k = 10))
        .select($"query_id", $"vec_id",
          round($"distance", 4).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // Filtered search: predicate narrows the scan BEFORE distance work
    // (pushed to parquet; the reference can only route whole shards).
    "knn_filtered" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.filter($"label" === 3)
        .crossJoin(broadcast(q))
        .select($"vec_id", $"label",
          round(l2sq($"embedding", $"qvec"), 4).as("distance"))
        .orderBy($"distance", $"vec_id")
        .limit(5)
    }),

    // Cosine similarity top-k (descending) — similarity-search baseline.
    "cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(q))
        .select($"vec_id", round(cosine($"embedding", $"qvec"), 6).as("sim"))
        .orderBy($"sim".desc, $"vec_id")
        .limit(10)
    }),

    // Grouped top-k via the custom BottomK bounded-heap aggregate
    // (graft.expressions.BottomK): per-label 3 nearest to the query.
    // Map-side partial aggregation reduces each task's slice to ≤ k pairs
    // before the shuffle — the scale-correct form of per-group top-k
    // (the oracle states the same semantics as a window).
    "grouped_topk" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.crossJoin(broadcast(q))
        .select($"label".cast("long").as("label"), $"vec_id",
          l2sq($"embedding", $"qvec").as("distance"))
        .groupBy($"label")
        .agg(graft.expressions.BottomK.bottomK($"distance", $"vec_id", 3).as("hits"))
        .select($"label", posexplode($"hits"))
        .select($"label", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("vec_id"), round($"col.distance", 4).as("distance"))
        .orderBy($"label", $"rank")
    }),

    // Range (radius) search: all vectors within squared-L2 1.6 of the
    // query — the filter-in-scan counterpart of top-k.
    "knn_range" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(q))
        .select($"vec_id", l2sq($"embedding", $"qvec").as("distance"))
        .filter($"distance" <= 1.6)
        .select($"vec_id", round($"distance", 4).as("distance"))
        .orderBy($"distance", $"vec_id")
    }),

    // Vector normalization: after l2normalize, dot ≡ cosine and every
    // norm is 1 (the preprocessing that turns a cosine ANN into a dot
    // ANN). Outputs scalars so the check is value-exact.
    "vector_normalize" -> ((s, dir) => {
      import s.implicits._
      val n = l2normalize($"embedding")
      Tables.embeddings(s, dir)
        .select($"vec_id",
          round(element_at(n, 1), 6).as("first_n"),
          round(aggregate(n, lit(0.0), (a, x) => a + x * x), 6).as("norm_sq"))
        .orderBy($"vec_id")
    }),

    // Per-label vector statistics (norm distribution). Cross-row double
    // sums go through round→decimal so aggregation order cannot perturb
    // the result (float-determinism discipline, SURVEY.md §7 risk 2).
    "vector_stats" -> ((s, dir) => {
      import s.implicits._
      val normR = round(l2norm($"embedding"), 4)
      Tables.embeddings(s, dir)
        .select($"label".cast("long").as("label"), normR.as("norm"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          (sum($"norm".cast(DecimalType(12, 4))).cast("double") / count(lit(1))).as("avg_norm"),
          min($"norm").as("min_norm"),
          max($"norm").as("max_norm"))
        .orderBy($"label")
    }),

    // Top principal direction by power iteration (3 rounds, uniform
    // start): the X·(Xᵀv)-free PCA form — no d×d covariance, one
    // d-bounded shuffle per iteration, v a d-float driver round-trip.
    // Every cross-row float sum is ×1e4-quantized; v re-enters each
    // round as a 6-dp decimal cast to FLOAT so both engines fold
    // identical bits (the ann_refined stabilization).
    "embed_pc1" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Pca.pc1(Tables.embeddings(s, dir), dim = 64, iters = 3)
        .orderBy($"dim")
    })
  )

  /** One power-iteration round as DuckDB CTEs: consumes `vl$p` (scalar
    * REAL list), defines `w$t`/`n$t`/`v$t`/`vl$t`. Mirrors Pca.pc1's
    * quantization points exactly. */
  private def pcaIter(t: Int, p: Int): String =
    s"""y$t AS (
       |  SELECT embedding, list_sum(list_transform(range(1, 65), j ->
       |    CAST(embedding[j] AS DOUBLE) * CAST(vl[j] AS DOUBLE))) AS y
       |  FROM embeddings CROSS JOIN vl$p
       |), tm$t AS (
       |  SELECT j - 1 AS i,
       |    CAST(round(y * CAST(embedding[j] AS DOUBLE) * 1e4) AS BIGINT) AS q
       |  FROM y$t CROSS JOIN range(1, 65) r(j)
       |), w$t AS (
       |  SELECT i, CAST(sum(q) AS BIGINT) AS wq FROM tm$t GROUP BY i
       |), n$t AS (
       |  SELECT sqrt(CAST(sum(CAST(wq AS HUGEINT) * wq) AS DOUBLE)) / 1e4 AS norm
       |  FROM w$t
       |), v$t AS (
       |  SELECT i, CAST(round(wq / 1e4 / norm * 1e6) AS BIGINT) AS vq, norm
       |  FROM w$t CROSS JOIN n$t
       |), vl$t AS (
       |  SELECT list(CAST(CAST(vq AS DOUBLE) / 1e6 AS REAL) ORDER BY i) AS vl
       |  FROM v$t
       |)""".stripMargin

  def oracle: Map[String, String] = Map(

    "embed_pc1" ->
      s"""WITH vl0 AS (
         |  SELECT list_transform(range(1, 65), j -> CAST(0.125 AS REAL)) AS vl
         |),
         |${pcaIter(1, 0)},
         |${pcaIter(2, 1)},
         |${pcaIter(3, 2)}
         |SELECT CAST(i + 1 AS INTEGER) AS dim,
         |  vq / 1e6 AS pc1,
         |  CAST(CAST(round(norm * 1e3) AS BIGINT) AS DOUBLE) / 1e3 AS lambda
         |FROM v3 ORDER BY dim""".stripMargin,

    "knn_single" ->
      s"""SELECT e.vec_id,
         |       round(${duckL2sq("e.embedding", "q.qvec")}, 4) AS distance
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |ORDER BY distance, e.vec_id
         |LIMIT 10""".stripMargin,

    "knn_grouped" ->
      s"""SELECT * FROM (
         |  SELECT query_id, vec_id, round(distance, 4) AS distance,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY distance, vec_id) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |           ${duckL2sq("e.embedding", "q.embedding")} AS distance
         |    FROM embeddings e
         |    JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
         |      ON e.vec_id % 4 = q.vec_id % 4
         |  )
         |) WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "knn_batch" ->
      s"""SELECT * FROM (
         |  SELECT query_id, vec_id, round(distance, 4) AS distance,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY distance, vec_id) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |           ${duckL2sq("e.embedding", "q.embedding")} AS distance
         |    FROM embeddings e
         |    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
         |  )
         |) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // chunking must be invisible: identical result set to knn_batch
    "knn_batch_chunked" ->
      s"""SELECT * FROM (
         |  SELECT query_id, vec_id, round(distance, 4) AS distance,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY distance, vec_id) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |           ${duckL2sq("e.embedding", "q.embedding")} AS distance
         |    FROM embeddings e
         |    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
         |  )
         |) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Raw top-10 over the duplicated corpus, then min-per-id and a dense
    // re-rank — the exact dedupById fold. Identical (distance, vec_id)
    // duplicate pairs make the intra-pair row_number arbitrary in both
    // engines, but the surviving (query, id, distance) set is the same
    // whichever copy the cutoff keeps, so the result is deterministic.
    "knn_dedup" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
         |), raw AS (
         |  SELECT query_id, vec_id, distance,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY distance, vec_id) AS rn
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |           ${duckL2sq("c.embedding", "q.embedding")} AS distance
         |    FROM corpus c
         |    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
         |  )
         |), survivors AS (
         |  SELECT query_id, vec_id, min(distance) AS distance
         |  FROM raw WHERE rn <= 10
         |  GROUP BY query_id, vec_id
         |)
         |SELECT query_id, vec_id, round(distance, 4) AS distance,
         |       row_number() OVER (PARTITION BY query_id
         |                          ORDER BY distance, vec_id) AS rank
         |FROM survivors
         |ORDER BY query_id, rank""".stripMargin,

    "knn_filtered" ->
      s"""SELECT e.vec_id, e.label,
         |       round(${duckL2sq("e.embedding", "q.qvec")}, 4) AS distance
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |WHERE e.label = 3
         |ORDER BY distance, e.vec_id
         |LIMIT 5""".stripMargin,

    "cosine_topk" ->
      s"""SELECT e.vec_id,
         |  round(${duckDot("e.embedding", "q.qvec")} /
         |    (sqrt(${duckDot("e.embedding", "e.embedding")}) *
         |     sqrt(${duckDot("q.qvec", "q.qvec")})), 6) AS sim
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id != 0
         |ORDER BY sim DESC, e.vec_id
         |LIMIT 10""".stripMargin,

    "grouped_topk" ->
      s"""SELECT label, rank, vec_id, distance FROM (
         |  SELECT CAST(e.label AS BIGINT) AS label, e.vec_id,
         |    round(${duckL2sq("e.embedding", "q.qvec")}, 4) AS distance,
         |    CAST(row_number() OVER (PARTITION BY e.label
         |      ORDER BY ${duckL2sq("e.embedding", "q.qvec")}, e.vec_id) AS BIGINT) AS rank
         |  FROM embeddings e
         |  CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |)
         |WHERE rank <= 3
         |ORDER BY label, rank""".stripMargin,

    "knn_range" ->
      s"""SELECT e.vec_id,
         |       round(${duckL2sq("e.embedding", "q.qvec")}, 4) AS distance
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id != 0
         |  AND ${duckL2sq("e.embedding", "q.qvec")} <= 1.6
         |ORDER BY distance, e.vec_id""".stripMargin,

    "vector_normalize" ->
      s"""WITH t AS (
         |  SELECT vec_id, embedding,
         |         sqrt(${duckDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |)
         |SELECT vec_id,
         |  round(CAST(embedding[1] AS DOUBLE) / nrm, 6) AS first_n,
         |  round(list_sum(list_transform(range(1, len(embedding) + 1), d ->
         |    (CAST(embedding[d] AS DOUBLE) / nrm) * (CAST(embedding[d] AS DOUBLE) / nrm))), 6) AS norm_sq
         |FROM t
         |ORDER BY vec_id""".stripMargin,

    "vector_stats" ->
      s"""SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
         |  CAST(sum(CAST(norm AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_norm,
         |  min(norm) AS min_norm,
         |  max(norm) AS max_norm
         |FROM (SELECT label,
         |        round(sqrt(${duckDot("embedding", "embedding")}), 4) AS norm
         |      FROM embeddings)
         |GROUP BY label
         |ORDER BY label""".stripMargin
  )
}
