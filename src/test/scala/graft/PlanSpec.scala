package graft

/** Physical-plan assertions: the plans must be the ones that survive a
  * 100× scale-up — filters pushed to parquet, columns pruned, dims
  * broadcast, top-k fused. A correctness-green query with the wrong plan
  * fails here. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("knn_single fuses to TakeOrderedAndProject (per-partition top-k + merge)") {
    assert(plan("knn_single").contains("TakeOrderedAndProject"))
  }

  test("sample_quantiles: the hash-sample is TakeOrderedAndProject, never a global sort") {
    val p = plan("sample_quantiles")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1_agg prunes columns: scan reads only what the query needs") {
    val p = plan("q1_agg")
    // ReadSchema must not include unused wide columns
    assert(!p.contains("l_partkey"), "l_partkey should be pruned")
    assert(!p.contains("l_suppkey"), "l_suppkey should be pruned")
  }

  test("q3/q5 joins broadcast the dimension side") {
    assert(plan("q3_join").contains("BroadcastHashJoin"))
    assert(plan("q5_join").contains("BroadcastHashJoin"))
  }

  test("q1_agg aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("knn_batch broadcasts the query side (vectors never shuffle)") {
    val p = plan("knn_batch")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("whole-stage codegen covers the hot pipelines (post-AQE final plans)") {
    // '*(' prefixes mark operators inside a WholeStageCodegen stage; AQE
    // only finalizes the plan after execution.
    val q1 = SparkEntry.queries("q1_agg")(spark, sf)
    q1.collect()
    assert(q1.queryExecution.executedPlan.toString.contains("*("))
    val knn = SparkEntry.queries("knn_single")(spark, sf)
    knn.collect()
    assert(knn.queryExecution.executedPlan.toString.contains("*("))
  }

  test("join_semi/join_anti plan as semi/anti joins, not inner+distinct") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }

  test("events_hourly scan prunes the props JSON column") {
    val p = plan("events_hourly")
    assert(!p.contains("props"), "props should be pruned from the events scan")
  }

  test("range_band plans as an equi join on the band, not a nested loop") {
    val p = plan("range_band")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("dedup plans contain no unbounded per-group array aggregation") {
    // cluster membership must be a (rep, id) mapping frame, never a
    // collect_list row — a web-scale duplicate cluster would otherwise
    // become one unbounded array in a single aggregation buffer
    Seq("dedup_minhash", "dedup_ngram", "dedup_simhash", "dedup_keep", "dedup_cc")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("collect_list"), s"$q plan materializes member arrays")
        spark.catalog.clearCache()
      }
  }

  test("multimodal frame sampling never carries the binary column") {
    val p = plan("multimodal_stats")
    // the Generate (explode) input must not include the bytes column
    val gen = p.linesIterator.filter(_.contains("Generate")).mkString
    assert(!gen.contains("bytes"), "explode input should drop media bytes")
  }

  test("candidate-pair generators plan as equi joins — no nested loop, no cartesian") {
    Seq("dedup_simhash", "fp_overlap", "dedup_cc").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plans a quadratic join:\n$p")
      spark.catalog.clearCache()
      // drop pass garbage but keep the index manager's live pins — a
      // blanket unpersist here turns later cache hits into rebuilds
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
  }

  test("doc_fingerprint scan reads only doc_id and text") {
    val p = plan("doc_fingerprint")
    assert(!p.contains("n_chars") && !p.contains("lang"),
      "winnow query should prune all metadata columns")
  }

  test("multimodal_ann: cell assignment is row-local, query side broadcast") {
    val p = plan("multimodal_ann")
    // no exchange may feed the probe join's vector side beyond the
    // broadcast of the tiny query set; the kernel names appear inline
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("no query in the whole suite plans a CartesianProduct") {
    // the kNN/theta cross joins are query-side BROADCAST nested loops by
    // construction — a CartesianProduct anywhere means a broadcast hint
    // was lost and both sides would shuffle-pair at scale
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("no query in the suite plans a data-cardinality single-partition window") {
    // `X OVER (ORDER BY …)` with no PARTITION BY funnels every row
    // through ONE task — the classic global-window scale-killer (VERDICT
    // r8: customer_rfm). A global window is acceptable only when its
    // input is bounded by construction:
    //  - its order key is a spark_partition_id column (the distributed
    //    prefix-scan offsets frame: one row per partition, cluster-sized
    //    — Packing.manifest / Rank.withGlobalRank), or
    //  - a GlobalLimit sits below it (the frame is a ≤k-row top-k, e.g.
    //    hybrid_rrf's two 50-row rank branches).
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          !w.orderSpec.exists(_.child.references.exists(a =>
            a.name == "__pid" || a.name == "pid")) &&
          w.child.collectFirst { case l: GlobalLimit => l }.isEmpty => w
      }
      spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"data-cardinality single-partition window in: $offenders")
  }

  test("ann_refined: Lloyd steps are join-free (row-local assignment)") {
    val p = plan("ann_refined")
    // each refine step = row-local argmin + two aggregations; the only
    // joins a naive form would add (assign → join back on id) must not
    // exist — at 100 TB that join re-shuffles the vector corpus per step
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir_weights: bucket weights broadcast; corpus never sort-merge-joins") {
    val p = plan("dsir_weights")
    // the ≤buckets weight table must ride to the token-scoring join as
    // a broadcast — a sort-merge there re-shuffles the exploded corpus
    // on the bucket key at 100 TB
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("vocab_coverage: the vocabulary cut reaches the OOV join as a broadcast") {
    val p = plan("vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
