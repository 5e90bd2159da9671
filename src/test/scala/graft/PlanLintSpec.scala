package graft

/** Plan lint over the WHOLE contract surface: every query's physical plan is
  * checked for the two classic scale-killers —
  *
  *  - `CartesianProduct`: an unkeyed join that explodes quadratically;
  *  - `Exchange SinglePartition`: a stage that funnels every row through ONE
  *    task (global windows/sorts without partitioning).
  *
  * Queries whose OUTPUT is a single scalar row legitimately end in a
  * single-partition final aggregate — those are allow-listed individually so
  * any new offender must be justified here.
  */
class PlanLintSpec extends SparkSpec {

  // eagerly-executing streaming queries: plans are exercised (and bounded) by
  // their own specs; building them here would run full streaming lifecycles
  private val streaming = Set("seg_stream_equiv", "seg_stream_native",
    "seg_stream_stateful", "seg_retention_stream", "seg_stream_enrich",
    "seg_stream_attribution", "sessions_stream_closed")

  // scalar/global outputs: the FINAL one-row aggregate is the result itself,
  // upstream partial aggregation still runs distributed
  private val scalarOutput = Set(
    "q6_revenue",          // single global revenue row
    "cohort_retention",    // one row of cohort counts
    "seg_overlap_hll",     // one sketch-algebra row
    "text_lang_dist",      // tiny final distribution (global agg then sort)
    "top10_customers",     // global TakeOrdered boundary
    "events_daily_filled", // 1-row min/max bounds seed the date spine
    "topk_words_sketch",   // the merged sketch is one scalar state row
    "bm25_search",         // 1-row corpus stats (N, Σdl) seed the scoring;
                           // the top-k itself is a TakeOrdered
    "vocab_drift",         // one overlap-stats row from two TakeOrdered
                           // top-k sets
    "events_locf",         // 1-row global max-day bound seeds each user's
                           // spine explode (per-user windows stay partitioned)
    "events_running_users", // cumsum over the #days-sized aggregated frame —
                           // the first-seen rewrite already collapsed users
    "seg_bitmap_algebra",  // one sketch-algebra row over two 1-row states
    "seg_theta_algebra",   // one theta-algebra row over three 1-row frames
    "theta_weekly_retention", // lag window over the #weeks-sized state frame
    "q14_promo",           // single promo-share row
    "q17_small_qty",       // single avg-yearly row
    "q19_disjunctive",     // single disjunctive-revenue row
    "q15_top_supplier",    // 1-row max-revenue bound joins back
    "q18_large_orders")    // global TakeOrdered boundary (as top10_customers)

  // broadcast nested-loop joins: quadratic like a cartesian, just with one
  // side shipped whole to every executor — it slips the CartesianProduct
  // lint because it is a different physical node. Allow-listed only where a
  // brute-force lane is the documented design AND byte-budget-guarded
  // (ngramJaccardPairs.maxDirectBroadcastBytes; ann brute force broadcasts
  // the bounded QUERY set, never the corpus).
  private val bnljAllowed = Set(
    "ann_topk_brute",        // baseline lane: bounded query set broadcast
    "ann_topk_ivf",          // queries x bounded centroid table (cells ≤ nlist)
    "ann_topk_quant",        // int8 prescreen lane: same bounded-query broadcast
    "ngram_jaccard_neardup") // direct branch, guarded by maxDirectBroadcastBytes

  test("no broadcast nested-loop join outside allow-listed brute-force lanes") {
    // scalarOutput queries are additionally exempt: their BNLJs join ONE-ROW
    // aggregate frames (corpus stats, overlap algebra) — constant-size by
    // construction, not a quadratic risk
    for ((name, fn) <- SparkEntry.queries
         if !streaming(name) && !bnljAllowed(name) && !scalarOutput(name)) {
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a broadcast nested-loop join:\n$plan")
    }
  }

  test("no cartesian product in any contract plan") {
    for ((name, fn) <- SparkEntry.queries if !streaming(name)) {
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian join:\n$plan")
    }
  }

  test("no single-partition exchange outside scalar-output queries") {
    for ((name, fn) <- SparkEntry.queries if !streaming(name) && !scalarOutput(name)) {
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"$name funnels rows through one task:\n$plan")
    }
  }

  // Pinned shuffle-exchange counts per query (hash/range/single-partition
  // exchanges; broadcasts excluded — they are the cheap build-side shape the
  // lint WANTS). The absolute-seconds bench hides an accidental extra
  // exchange behind ±15% noise; this catches it at plan level. Measured with
  // `Test/runMain graft.PlanShuffleCount` (AQE off, sf0.001) — re-run that
  // and consciously re-pin here when a plan legitimately changes.
  private val pinnedShuffles = Map(
    "seg_naive" -> 2, "seg_idempotent" -> 3, "seg_idempotent_approx" -> 3,
    "seg_w4_any" -> 3, "seg_w4_latest" -> 3, "seg_latest_event" -> 2,
    "seg_first_event" -> 2, "seg_eventtime" -> 3, "seg_microbatch_equiv" -> 3,
    "seg_multi" -> 2, "skew_salted_counts" -> 3, "asof_assignment" -> 3,
    "range_join_orders" -> 2, "range_overlap_sessions" -> 1,
    "winsorized_stats" -> 3, "corr_value_hour" -> 2, "hist_value" -> 3,
    "sessions_stats" -> 2, "agg_moments" -> 2, "doc_chunks" -> 1,
    "packed_chunks" -> 2, "pivot_user_activity" -> 3, "text_repetition" -> 1,
    "unpivot_user_activity" -> 4, "ntile_orders" -> 3,
    "sample_events_hash" -> 1, "stratified_sample" -> 2,
    "docs_filtered_stats" -> 2, "funnel_levels" -> 2, "sequence_match" -> 2,
    "sequence_count" -> 2, "cohort_retention" -> 2, "seg_microbatch_hll" -> 3,
    "q1_pricing" -> 2, "q2_min_cost_supplier" -> 3, "seg_overlap_hll" -> 4,
    "q3_revenue" -> 3, "q5_revenue" -> 2, "semi_customers" -> 1,
    "anti_customers" -> 1, "window_top2_orders" -> 2, "agg_event_stats" -> 3,
    "events_daily" -> 3, "events_daily_filled" -> 2, "events_locf" -> 4,
    "events_interp" -> 3, "events_running_users" -> 5,
    "events_moving_avg" -> 2, "events_delta_sum" -> 2,
    "events_bounding_ratio" -> 2, "q15_top_supplier" -> 4,
    "q18_large_orders" -> 1, "semantic_dedup" -> 4, "gopher_quality" -> 1,
    "phrase_search" -> 2, "weighted_median_price" -> 2, "twa_value" -> 2,
    "cohort_matrix" -> 4, "dedup_keep_best" -> 2, "rolling_7d_users" -> 8,
    "quality_classifier" -> 1, "interval_union_days" -> 2,
    "topk_words_by_source" -> 3, "seg_bitmap_algebra" -> 4,
    "seg_theta_algebra" -> 6, "theta_weekly_retention" -> 5,
    "rolling_30d_users_hll" -> 8, "events_props_extract" -> 2,
    "q6_revenue" -> 1, "q4_late_shipments" -> 2, "q14_promo" -> 1,
    "q17_small_qty" -> 2, "q19_disjunctive" -> 1, "q7_volume" -> 2,
    "q10_returned_top20" -> 1, "rollup_pricing" -> 2, "cube_pricing" -> 2,
    "grouping_sets_pricing" -> 2, "user_event_types" -> 2,
    "intersect_users" -> 3, "except_users" -> 3, "top10_customers" -> 1,
    "agg_value_stats_ext" -> 2, "events_hourly_windows" -> 2,
    "outer_nation_suppliers" -> 2, "full_outer_daily" -> 3,
    "window_order_gaps" -> 2, "pct_value_by_type" -> 2,
    "pct_value_sketch" -> 4, "sql_orders_per_customer" -> 2,
    "dedup_exact_demo" -> 2, "dedup_exact_stats" -> 3, "text_quality" -> 1,
    "bpe_tokens" -> 1, "bpe_encode_hash" -> 1, "embedding_centroids" -> 2,
    "dedup_clusters" -> 1, "incremental_clusters" -> 1, "text_lang_dist" -> 2,
    "doc_fingerprints" -> 1, "doc_fingerprints_ext" -> 1,
    "ann_topk_brute" -> 2, "ann_topk_srp" -> 3, "ann_topk_ivf" -> 3,
    "ann_topk_ivf_disk" -> 2, "ann_topk_quant" -> 2, "minhash_neardup" -> 1,
    "ngram_jaccard_neardup" -> 1, "containment_neardup" -> 2,
    "editdist_neardup" -> 1, "bm25_search" -> 5, "leakage_split" -> 1,
    "quality_tiered_sample" -> 1, "incremental_neardup" -> 1,
    "tfidf_top_terms" -> 5, "zorder_event_keys" -> 0, "simhash_neardup" -> 2,
    "embedding_neardup" -> 2, "multimodal_bytestats" -> 1,
    "contamination_check" -> 3, "contamination_bloom" -> 2,
    "dup_ngram_frac" -> 3, "dedup_spans" -> 4, "source_rebalance" -> 3,
    "media_phash_neardup" -> 2, "text_bigram_rarity" -> 1,
    "pii_redaction" -> 1, "vocab_top_words" -> 1, "vocab_drift" -> 3,
    "topk_words_sketch" -> 2, "pipeline_clean_stats" -> 3,
    "multimodal_decode" -> 1)

  test("shuffle-exchange count per query stays at its pinned value") {
    for ((name, fn) <- SparkEntry.queries if !streaming(name)) {
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      val n = PlanShuffleCount.count(plan)
      pinnedShuffles.get(name) match {
        case None => fail(s"$name has no pinned shuffle count — run " +
          s"Test/runMain graft.PlanShuffleCount and pin it (measured: $n)")
        case Some(pin) => assert(n <= pin,
          s"$name plans $n shuffle exchanges, pinned at $pin — an exchange " +
          s"was added; justify and re-pin or fix the plan:\n$plan")
      }
    }
  }
}
