package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality gate over every declared query: catches structural scale
  * hazards at test time (SURVEY.md §9) — an accidental non-broadcast
  * cartesian product would be quadratic at 100 TB regardless of how fast it
  * runs on the fixtures.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("no query plans a non-broadcast cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }

  test("explicitly-broadcast joins keep their broadcast in the physical plan") {
    val broadcastQueries = Seq("j4_orders_by_region", "j3_enrich_docs",
      "e2_knn_topk", "e3_knn_batch", "e6_ivf_knn", "dc1_decontaminate")
    broadcastQueries.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("Broadcast"), s"$name lost its broadcast:\n$plan")
    }
  }

  test("ranked-filter queries use per-partition k-heaps before the shuffle, no sort") {
    // With GraftExtensions (which the shared test session, Verify and Bench
    // all carry) the KNN rank is the custom TopKPerKey physical operator:
    // bounded heaps on BOTH sides of the key exchange and no sort at all —
    // strictly stronger than the WindowGroupLimit plan it replaces (that
    // one still sorted the per-partition survivors).
    Seq("e3_knn_batch").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("PartialTopKPerKey") && plan.contains("FinalTopKPerKey"),
        s"$name rank did not plan the bounded-heap TopKPerKey operator:\n$plan")
      // the final presentation orderBy (15 rows) may sort; the rank itself
      // must not plan a window limit
      assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window "),
        s"$name still plans a sort-based window rank:\n$plan")
    }
  }

  test("a13 heavy hitters: O(k) sketch prune + broadcast exact pass") {
    val plan = SparkEntry.queries("a13_heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    // the unbounded-key stream must meet ONLY the MG sketch (object agg,
    // O(k) state); the exact count must touch only the <= k candidates via
    // a broadcast join — a shuffled exact count of every key is the thing
    // this operator exists to avoid at 100 TB
    assert(plan.contains("graft_heavy_hitters"),
      s"a13 lost the native sketch aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"a13's exact pass must broadcast the <=k candidates:\n$plan")
  }

  test("dd11 semantic dedup: hash-aggregated assignment, no sort-agg or window") {
    val plan = SparkEntry.queries("dd11_semantic_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    // nearest-centroid argmax is a packed-long primitive max — it must plan
    // as a hash aggregate, never SortAggregate (max_by/struct) or a window
    assert(!plan.contains("SortAggregate"),
      s"dd11 assignment fell back to SortAggregate:\n$plan")
    assert(!plan.contains("WindowExec"),
      s"dd11 assignment planned a window:\n$plan")
    // the index checkpoint severs the training subtree from the final
    // plan, so gate the assignment's own plan shape directly
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("vec", col("embedding").cast("array<double>"))
      .select("vec_id", "label", "vec")
    val aplan = graft.vector.Knn.ivfAssign(
        emb, graft.vector.Knn.ivfCentroids(emb, "vec", "label"),
        "vec_id", "vec", "label")
      .queryExecution.executedPlan.toString
    assert(aplan.contains("BroadcastNestedLoopJoin") || aplan.contains("BroadcastExchange"),
      s"ivfAssign centroids are not broadcast:\n$aplan")
    assert(aplan.contains("HashAggregate") && !aplan.contains("SortAggregate"),
      s"ivfAssign argmax is not a hash aggregate:\n$aplan")
  }

  test("upsert last-writer-wins is a single aggregate, not a window sort") {
    val plan = SparkEntry.queries("d1_upsert_lastwins")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate") && !plan.contains("Window"),
      s"d1 should plan a max_by hash aggregate with map-side partials:\n$plan")
  }

  test("partitioned-sink read-back prunes at the partition level") {
    // s5: the o_orderpriority predicate must land in PartitionFilters (file
    // listing), not DataFilters (row groups) — at 100 TB the difference is
    // listing 1/5th of the files vs opening all of them.
    val plan = SparkEntry.queries("s5_partitioned_scan")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderpriority"),
      s"s5 partition predicate did not reach PartitionFilters:\n$plan")
  }

  test("bucketed join subtree plans zero shuffle exchanges") {
    // j8: both scan sides are bucketed on the join key — the only exchange
    // in the whole plan should be the post-join groupBy's.
    val plan = SparkEntry.queries("j8_bucketed_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"j8 did not plan a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"j8 scans are not bucketed:\n$plan")
    // the only hash exchange allowed is the post-join groupBy's; the join
    // keys must never shuffle
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("o_orderstatus"),
        s"unexpected shuffle on the bucketed join keys: $l\n$plan")
    }
  }

  test("nested struct fields prune to the accessed leaf at the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft-nested").toString
    import org.apache.spark.sql.functions._
    Tables.events(spark, sf)
      .select(col("event_id"),
        struct(col("user_id"), struct(col("value"), col("event_type")).as("inner"))
          .as("props_struct"))
      .write.parquet(s"$base/t")
    val q = spark.read.parquet(s"$base/t")
      .select(col("props_struct.inner.value"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && scan.contains("value") &&
      !scan.contains("event_type"),
      s"nested pruning failed — scan reads more than the accessed leaf:\n$scan")
  }

  test("global (no-partitionBy) windows only ever see pre-reduced data") {
    // A Window with an empty partitionSpec funnels its whole input through
    // ONE task (Exchange SinglePartition). That is only scale-safe when the
    // input was already reduced by an aggregation (distinct keys, grouped
    // rows) — never over raw full data, where it becomes the serial
    // bottleneck at 100 TB no matter how fast the fixtures run.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      plan.foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          val reduced = w.child.exists {
            case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
            case _ => false
          }
          assert(reduced,
            s"$name plans a global window over un-reduced (non-aggregated) data:\n$plan")
        case _ => ()
      }
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort+limit") {
    Seq("w1_top_orders", "e2_knn_topk", "dd5_embed_neardup",
        "q10_returned_items").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name does not use TakeOrderedAndProject:\n$plan")
    }
  }

  test("j9 probes the bloom on the fact side and broadcasts the dim") {
    val plan = SparkEntry.queries("j9_bloom_prune_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"j9 lost its bloom probe:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"j9 lost its broadcast join:\n$plan")
  }

  test("q3's three scan filters all reach their parquet scans as PushedFilters") {
    val plan = SparkEntry.queries("q3_shipping_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    // one pushed predicate per table: segment (customer), orderdate
    // (orders), shipdate (lineitem) — a filter evaluated post-scan reads
    // the whole fact at 100 TB
    Seq("c_mktsegment", "o_orderdate", "l_shipdate").foreach { c =>
      val pushed = plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains(c))
      assert(pushed, s"q3 filter on $c not pushed to its scan:\n$plan")
    }
  }

  test("heavy queries stay inside their shuffle budget") {
    // Every ShuffleExchange moves the full frame across the cluster at
    // 100 TB — an extra one is a silent order-of-magnitude regression
    // that fixture-speed tests never notice. Budgets are the audited
    // plan shapes (graft.tools.ExchangeAudit); tightening is welcome,
    // exceeding means a deliberate redesign, not a drive-by edit.
    val budgets = Map(
      "q1_pricing_summary" -> 2, "ta5_tfidf_topk" -> 2, "w2_sessionize" -> 2,
      "dd1_exact_dedup" -> 3, "dd2_minhash_lsh" -> 4, "dd3_simhash" -> 3,
      "dd4_ngram_jaccard" -> 1, "dd5_embed_neardup" -> 1,
      "dd6_simhash_hamming" -> 3, "dd7_minhash_est" -> 6,
      "dd8_lsh_verified" -> 6, "dd9_dup_groups" -> 3, "dd10_dedup_apply" -> 3,
      "dd11_semantic_dedup" -> 4, "a2_profile_groups" -> 4,
      "a9_salted_agg" -> 3, "a13_heavy_hitters" -> 4, "j7_salted_skew_join" -> 4,
      "e6_ivf_knn" -> 1, "e9_quantized_recall" -> 7,
      "tp1_token_packing" -> 3, "dc1_decontaminate" -> 4,
      "sp3_mixture_sample" -> 2, "o2_zorder_layout" -> 2,
      "j9_bloom_prune_join" -> 4, "o1_compaction" -> 2,
      "st6_stream_sessions" -> 1, "st7_stream_outer_join" -> 1,
      "pl2_training_pipeline" -> 8, "mm3_image_ahash" -> 5,
      "st8_incremental_agg" -> 1, "mm4_audio_fingerprint" -> 5,
      "gr1_pagerank" -> 3,
      "d4_scd2_history" -> 2, "d5_cdc_apply" -> 3, "sp4_group_split" -> 3,
      // ta8: 1 agg shuffle + the round-8 deliberate 32-way repartition that
      // parallelizes the compute-bound bigram explode off the single-split
      // fixture (the dd2 pattern; 0.6 s -> 0.2 s at sf0.1)
      "ta8_bpe_pairs" -> 2, "a14_sketch_union" -> 4,
      "tp2_curriculum" -> 2,
      "st9_stream_dedup" -> 3, "st10_stream_static" -> 2,
      "o4_partition_overwrite" -> 2,
      // 15 -> 11 across the r10 rep-tier rework (clone-clique quadratic
      // bought off, shared slim digest frame), -> 9 in r11: verifyJaccard
      // consumes the pair list once, dropping the two-join union shuffle
      "dd12_incremental_dedup" -> 9,
      "a15_cov_corr" -> 2, "sp5_temperature_mixture" -> 5,
      "gr3_triangle_census" -> 4, "ta9_bigram_lm" -> 5,
      "a16_histogram" -> 2, "w6_trailing_range" -> 2,
      "dd13_editdistance_dedup" -> 4, "a17_mode_per_user" -> 3,
      "st11_dedup_window_chain" -> 1, "ta10_bm25_topk" -> 5,
      "dd14_line_dedup" -> 5, "sp6_pps_sample" -> 2,
      "tp3_chunk_overlap" -> 2, "st12_foreachbatch_merge" -> 1,
      "dd15_span_dedup" -> 6, "q3_shipping_priority" -> 1,
      "q5_local_supplier_volume" -> 2, "f16_url_parse" -> 3,
      "a18_equidepth_bins" -> 2, "w7_value_episodes" -> 2,
      "o6_snapshot_diff" -> 3, "ta11_normalize" -> 1,
      "dd16_canonical_pick" -> 7,
      "dq1_constraint_suite" -> 3, "pv1_k_anonymity" -> 2,
      "tp4_importance_select" -> 3, "q18_large_volume" -> 1,
      "rr1_hybrid_rrf" -> 9, "ret1_cohort_retention" -> 6,
      "e10_matryoshka_recall" -> 7, "j10_interval_overlap" -> 2,
      "dq2_drift" -> 4, "w8_cumulative_users" -> 5,
      "geo1_track_stats" -> 2, "fn1_funnel" -> 2, "dq3_anomaly" -> 3,
      "mm5_frame_sample" -> 2, "ta12_html_strip" -> 2,
      "sp8_token_budget" -> 2, "a20_cooccurrence" -> 3,
      "j11_asof_tolerance" -> 3, "lr1_price_regression" -> 2,
      "f17_feature_hash" -> 3, "q7_nation_trade" -> 2,
      "q10_returned_items" -> 1, "tp5_length_buckets" -> 2,
      "dq4_skew_stats" -> 4, "u4_pivot_wide" -> 3,
      "a21_trailing_dau" -> 4, "dq5_profile" -> 2,
      "j12_point_in_time" -> 5, "w9_wow_change" -> 3,
      "gr2_triangle_count" -> 6, "s7_netcdf_decode" -> 1,
      "s8_netcdf_inspect" -> 1, "s11_netcdf_cdf5" -> 1,
      "s12_netcdf_hdf5" -> 1, "s13_hdf5_groups" -> 1,
      "mm7_video_frames" -> 2,
      // +2 over the pre-rep-tier shape for the r10 (digest, side) agg and
      // clone fan-out join, -2 in r11 for the single-consumption verify
      "dc2_neardup_decontam" -> 8,
      // r13 streaming rows: the RESULT frame is the post-drain read (memory
      // table sort / sink-tree global agg); the drain itself is gated by
      // the oracle, not a shuffle count
      "st14_status_replay" -> 1, "st15_bulk_append" -> 2,
      "st16_stateful_upload" -> 2,
      // r14 BPE rows: ta13's RESULT frame is the driver-built merge table
      // (train rounds run on the RDD core at construction, each bounded by
      // vocab²); tp6's four are the corpus repartition (ta8's single-split
      // parallelism lesson) + per-doc agg + pack cumsum + chunk agg, with
      // the vocab→token-count map arriving by broadcast
      "ta13_bpe_train" -> 1, "tp6_bpe_pack" -> 4,
      // mm9: the mm7/mm8 shape — encode+decode spread by the deliberate
      // 32-way repartition, one sort for the ordered output
      "mm9_h264_residual" -> 2,
      // r14 acquisition rows: page-synthesis groupBy + ordered output;
      // acq2's prefix-sum window and existing-ledger join ride broadcasts
      // (audited 2/2/2 at landing)
      "acq1_index_links" -> 2, "acq2_download_plan" -> 2, "st17_crawl_ledger" -> 2,
      "acq3_sample_cache" -> 2,
      // r15 S1 twin: spec distinct + ordered output; the endpoint and
      // region-bounds constant tables ride broadcasts (audited 2/2)
      "s1_erddap_url" -> 2)
    budgets.foreach { case (name, budget) =>
      val (shuffles, _) = graft.tools.ExchangeAudit.countExchanges(
        SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
      assert(shuffles <= budget,
        s"$name plans $shuffles shuffle exchanges, budget is $budget — " +
          "a new shuffle at 100 TB needs a deliberate redesign")
    }
  }
}
