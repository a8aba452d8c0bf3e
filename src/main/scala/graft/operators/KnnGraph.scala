package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Corpus-wide k-NN graph — the m nearest neighbor ids for EVERY vector
  * in one batch plan. This is the backbone op of semantic dedup and
  * clustering over training corpora (SemDeDup, arXiv:2303.09540, builds
  * exactly this graph to drop semantic duplicates; k-NN-graph
  * construction is also the offline step of NN-Descent/HNSW-style index
  * builds). The reference serves one query at a time
  * (`src/rpc/search_service_impl.cc:33-50`); an all-corpus graph through
  * that path is N RPCs — here it is one job.
  *
  * Spark-first shape, reusing the two-level IVF blocking that already
  * bounds embedding dedup ([[Dedup.ivfTwoLevelBlocks]]):
  *  - assignment is row-local against driver-bounded coarse seeds +
  *    JOINED fine seeds (nothing O(N) crosses the driver);
  *  - candidates are the within-block pairs — block population is held
  *    ≈ targetBlock by construction (ProfileScale evidence in
  *    BASELINE.md), so candidate work is N·targetBlock, never N²;
  *  - per-vector top-m runs as the [[graft.expressions.BottomK]]
  *    k-bounded heap with map-side partial aggregation: each task
  *    reduces its slice to ≤ m hits per vector BEFORE the shuffle.
  *
  * Approximation contract: neighbors are found within a vector's fine
  * block only (the dedup-family trade); the DuckDB oracle replays the
  * identical blocking, so what is value-checked is the exact algorithm,
  * with brute-force `Knn` remaining the recall-1.0 single-query path.
  *
  * Duplicate-id note: rows are grouped by id here (a graph node IS an
  * id); duplicate-id rows (the preserved cross-shard quirk) contribute
  * their candidates to one node. Callers needing per-row graphs should
  * pre-dedup ids ([[Knn.dedupById]] semantics).
  */
object KnnGraph {

  /** (id, nbr_rank, nbr_id, distance): the m nearest other ids per
    * vector, ascending (distance, nbr_id) with dense 1-based ranks.
    * `nprobe` is the recall knob (each vector contributes candidates
    * from its nprobe nearest fine cells — the dedup_embedding_mp
    * trade): >1 inserts a min-distance collapse per (node, neighbor)
    * pair so a neighbor shared via two probed cells is counted once. */
  def build(vectors: DataFrame, m: Int, targetBlock: Int = 64,
      nprobe: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(m > 0, "m must be positive")
    val (_, assigned) =
      Dedup.ivfTwoLevelBlocks(vectors, targetBlock, idCol, embCol, nprobe = nprobe)
    val a = assigned.select(col("id").as("aid"), col("blk"), col("e").as("ae"))
    val b = assigned.select(col("id").as("bid"), col("blk"), col("e").as("be"))
    val cand = a.join(b, Seq("blk"))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), l2sq(col("ae"), col("be")).as("d"))
    val collapsed =
      if (nprobe == 1) cand
      else cand.groupBy(col("aid"), col("bid")).agg(min(col("d")).as("d"))
    collapsed
      .groupBy(col("aid"))
      .agg(graft.expressions.BottomK.bottomK(
        col("d"), col("bid").cast("long"), m).as("nbrs"))
      .select(col("aid"), posexplode(col("nbrs")))
      .select(col("aid").as(idCol),
        (col("pos") + 1).cast("int").as("nbr_rank"),
        col("col.id").as("nbr_id"),
        col("col.distance").as("distance"))
  }

  /** The full SemDeDup decision (arXiv:2303.09540 §3): build the k-NN
    * graph, keep edges closer than `maxL2Sq`, collapse chains with
    * connected components, and keep ONE representative (the minimum id)
    * per semantic-duplicate group. The reference exposes only
    * point-lookup search (`src/rpc/search_service_impl.cc:33-50`); this
    * is the corpus-curation operator built on top of it.
    *
    * Returns (idCol, component, keep) for EVERY distinct id: `component`
    * is the lowest id reachable through any chain of near-dup edges and
    * `keep` marks the representative (`component == id`). Scale shape:
    * edges come from [[build]] (candidate work N·targetBlock), the
    * closure is [[Dedup.connectedComponents]] (driver union-find below
    * the config gate, O(log diameter) pointer-jumping rounds above it).
    * The threshold compares the RAW fold-ordered distance, identically
    * in the DuckDB oracle, so the edge set — and therefore the grouping
    * — is deterministic on both engines. */
  /** Integer-quantized PageRank over a directed edge frame — hub scoring
    * for a k-NN graph (centrality-based data selection / dedup-survivor
    * ranking over corpora; the kNN-graph sibling of the CC labeling).
    *
    * Arithmetic is ENTIRELY ×1e6-scaled BIGINT: every node starts at
    * 1 000 000; one round is
    *   pr'(v) = 150 000 + (85 · Σ_{u→v} (pr(u) div outdeg(u))) div 100
    * i.e. damping 0.85 with the per-edge contribution an integer
    * division (both engines floor identically on non-negative values),
    * so round outputs are exact integers — no float summation order in
    * an ITERATED computation, where drift would compound per round.
    *
    * Scale shape is the Pregel step: contributions are one equi-join of
    * edges × current ranks (shuffle on src), one groupBy dst, one left
    * join back to nodes; `iters` is a fixed unroll (3 here) so lineage
    * stays bounded without checkpoints — the CC operator remains the
    * pattern for run-to-fixpoint loops. Nodes without in-edges keep the
    * 150 000 base mass. */
  def pageRankQ(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      idCol: String = "vec_id"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val ids = nodes.select(col(idCol).as("id"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesWithDeg = edges.join(deg, "src")
    var pr = ids.select(col("id"), lit(1000000L).as("pr_q"))
    (1 to iters).foreach { _ =>
      val inflow = edgesWithDeg
        .join(pr, col("src") === col("id"))
        .select(col("dst"), expr("pr_q div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      pr = ids
        .join(inflow, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(150000L) +
            expr("85L * coalesce(inflow, 0L) div 100L")).as("pr_q"))
    }
    pr.select(col("id").as(idCol), col("pr_q"))
  }

  def semanticComponents(vectors: DataFrame, m: Int = 3,
      maxL2Sq: Double = 1.0, targetBlock: Int = 64, nprobe: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val g = build(vectors, m, targetBlock, nprobe, idCol, embCol)
    val pairs = g.filter(col("distance") <= maxL2Sq)
      .select(least(col(idCol), col("nbr_id")).as("id1"),
        greatest(col(idCol), col("nbr_id")).as("id2"))
      .distinct()
    val nodes = vectors.select(col(idCol)).distinct()
    Dedup.connectedComponents(nodes, pairs, idCol)
      .select(col(idCol), col("component"),
        (col("component") === col(idCol)).as("keep"))
  }
}
