package graft

/** CI guard for the scale-critical plan properties recorded in PLANS.md:
  * losing a predicate pushdown, a dimension-table broadcast, or whole-stage
  * codegen on a registered query fails the build instead of silently
  * regressing the 100 TB plan shape.
  */
class PlanAuditSpec extends SparkTestBase {

  /** Queries whose scans MUST carry pushed filters (they filter base-table
    * columns before any shuffle).
    *
    * DELIBERATELY ABSENT — q21_percentile / pq75_source_quality (the
    * effective-count-0 contract, round 13): their scans carried a pushed
    * not-null filter through r12, and LOSING it was the point of the
    * percentile rework. Null-value rows must REACH the exact-rank aggregate
    * carrying c=0 so every consumer (census, both rank passes, the final
    * agg) shares ONE scan subtree; filtering nulls at the scan forks the
    * plan through aggregate pushdown — measured +1/+2 exchanges and a
    * second corpus scan (Percentiles.scala:70-107, PLANS.md r12→r13 diff).
    * Do NOT "fix" these back into mustPush: the no-pushdown shape is the
    * recorded decision, pinned by the dedicated test below.
    */
  private val mustPush = Set(
    "dq01_key_blocking", "dq04_scheduled", "dq06_retry_backoff",
    "dq07_quota_exact", "dq09_cms_rates",
    "pq03_lsh_pairs", "pq05_simhash_pairs", "pq07_embed_neardup",
    "pq08_knn_brute", "pq09_knn_lsh", "pq13_embed_neardup_lsh",
    "q01_pricing_summary", "q02_filter_project", "q03_join_revenue",
    "q04_multi_join", "q05_topk_customers", "q08_setops", "q09_semi_join",
    "q10_anti_join", "q11_rollup", "q15_above_avg", "q19_union_all",
    "q23_outer_join", "q24_full_outer")

  /** Queries with a small/dimension side that MUST broadcast (count is per
    * formatted-plan mention; each join appears twice).
    */
  private val mustBroadcast = Map(
    "dq07_quota_exact" -> 4, "dq09_cms_rates" -> 2,
    "pq03_lsh_pairs" -> 2, "pq05_simhash_pairs" -> 2, "pq06_jaccard_pairs" -> 4,
    "pq07_embed_neardup" -> 2, "pq08_knn_brute" -> 2, "pq54_hard_negatives" -> 2,
    "pq09_knn_lsh" -> 6,
    "pq13_embed_neardup_lsh" -> 6,
    // pq27: range base offsets broadcast back; pq34: keep-ids semi join —
    // losing either re-shuffles the full corpus
    "pq27_pack_sequences" -> 2, "pq34_fixed_count_sample" -> 2,
    // pq36: centroid set; pq38: bit-position + seen-key tables — the
    // structures that keep the corpus side shuffle-free
    "pq36_semantic_dedup" -> 2, "pq38_bloom_seen" -> 4,
    // pq43: the derived per-stratum rate table rides broadcast — losing it
    // shuffles the whole corpus onto ~5 stratum keys
    "pq43_budget_mix" -> 2,
    // pq47: the winnowed benchmark fingerprint set is the broadcast diet —
    // losing it shuffles every corpus fingerprint onto the probe join
    "pq47_decontam_winnow" -> 2,
    // pq48/pq49: the trained side tables (B-bucket ratios / df-pruned vocab)
    // must ride broadcast — losing one shuffles every exploded feature/token
    "pq48_dsir_weights" -> 2, "pq49_unigram_nll" -> 2,
    // pq56: the per-group set sizes; pq57: the total + threshold rows — each
    // must ride broadcast or the corpus re-shuffles for a metadata join
    "pq56_source_overlap" -> 4, "pq57_calibrated_quality" -> 4,
    // pq60: the composed gate threshold, mix rates, and n-rows must all
    // ride broadcast — losing any one re-shuffles the corpus stage
    "pq60_training_mix" -> 10,
    // the KNN family: the query batch must always ride broadcast — losing
    // it turns a map-side scored scan into a corpus-wide shuffle join
    "pq14_knn_ivf" -> 10, "pq31_knn_int8" -> 2, "pq35_knn_quantized_stack" -> 14,
    "q03_join_revenue" -> 4, "q04_multi_join" -> 8, "q05_topk_customers" -> 2,
    "q08_setops" -> 4, "q09_semi_join" -> 2, "q10_anti_join" -> 2,
    "q11_rollup" -> 2, "q15_above_avg" -> 2, "q23_outer_join" -> 2)

  /** Shuffle BUDGETS for the scale-critical queries: the number of data
    * Exchanges (broadcast excluded) each is allowed. A regression that adds
    * an Exchange to one of these — a lost broadcast, a lost co-partitioning,
    * an accidental repartition — fails the build; the full per-query record
    * lives in PLANS.md.
    */
  private val maxShuffles = Map(
    "dq14_session_windows" -> 1, "dq15_windowed_compaction" -> 1,
    // streaming near-dup pair: signature distinct is the only data shuffle;
    // dq17's index semi-join + query set must stay broadcast
    "dq16_stream_near_dedup" -> 1, "dq17_stream_lsh_flag" -> 1,
    "dq18_stream_pq_flag" -> 1,    // band-sig semi-join broadcast; one distinct exchange
    "dq19_stream_drift" -> 1,      // ONE windowed bucket_hist agg; KL folds row-locally vs the ref literal
    "dq20_stream_changed" -> 1,    // artifact id join (broadcast at test SF, co-bucketed in prod) + admit distinct
    "pq01_exact_dedup" -> 1, "pq02_minhash_sigs" -> 1, "pq03_lsh_pairs" -> 3,
    "pq05_simhash_pairs" -> 1, "pq06_jaccard_pairs" -> 6,
    "pq07_embed_neardup" -> 0,
    // KNN: one bounded-heap agg exchange each (top_k_by) — a Window
    // regression here re-sorts every scored candidate
    "pq08_knn_brute" -> 1, "pq09_knn_lsh" -> 2, "pq13_embed_neardup_lsh" -> 1,
    "pq14_knn_ivf" -> 3, "pq31_knn_int8" -> 1, "pq35_knn_quantized_stack" -> 3,
    "pq16_repetition" -> 2, "pq20_top_terms" -> 4, "pq25_minhash_verify" -> 4,
    "pq17_decontaminate" -> 2, // bench-side distinct + per-doc agg
    "pq18_dup_spans" -> 6,
    "pq19_stratified_sample" -> 0, "pq21_chunks" -> 0, "pq22_curation" -> 2,
    "pq26_label_centroids" -> 1,
    "pq27_pack_sequences" -> 3, // range partial-agg + tiny base window + local window
    "pq28_canonical_dedup" -> 1, "pq29_embed_quantize" -> 0,
    "pq30_corpus_report" -> 2, "pq32_corpus_top_terms" -> 1,
    "pq33_heavy_hitters" -> 1,
    "pq34_fixed_count_sample" -> 2, // bucketed prune + metadata-sized final rank
    "pq36_semantic_dedup" -> 5, // assign agg + in-cluster pair join + drop distinct + anti
    "pq37_pii_redaction" -> 0,  // pure row-local regexp chain
    "pq38_bloom_seen" -> 3,     // three DISTINCTs; every join broadcasts
    "pq39_kmeans" -> 0,         // centroid literals: row-local argmax, no corpus shuffle
    "pq40_semantic_dedup_kmeans" -> 2, // in-cluster pair join; drop set broadcast-anti
    "pq41_segment_dedup" -> 2,  // segment-hash election agg + doc reassembly
    "pq42_winnow_fingerprints" -> 0, // row-local sliding minima
    "pq43_budget_mix" -> 1,     // strata census agg; rates broadcast back
    "pq44_filter_funnel" -> 1,  // one partial-agg shuffle to strata cardinality
    "pq45_epoch_order" -> 1,    // the shard-key rank window
    "pq46_shard_manifest" -> 1, // one partial-agg shuffle to nShards rows
    "pq47_decontam_winnow" -> 2, // bench-side distinct + per-doc agg
    "pq48_dsir_weights" -> 1,   // per-doc agg; ratio table is a broadcast local relation
    "pq49_unigram_nll" -> 2,    // vocab partial agg + per-doc agg
    "pq51_quality_classifier" -> 1, // weight table broadcast; one per-doc agg
    "pq52_temperature_mix" -> 1,    // census agg; rates broadcast back, keep row-local
    "pq53_bm25_topk" -> 1,          // row-local scoring; only the per-query heap exchange
    "pq54_hard_negatives" -> 1,     // anchors broadcast; only the heap exchange
    "pq55_source_cap" -> 1,         // bounded per-source heap agg; no window sort
    "pq56_source_overlap" -> 4,     // (src,key) distinct + sizes + per-key sets + pair agg
    "pq57_calibrated_quality" -> 3, // score histogram + bounded cum window; thr broadcast back
    "pq58_snapshot_diff" -> 2,      // both snapshots keyed once for the full-outer id join
    "pq59_zipf_fit" -> 1,           // token-count agg; TakeOrdered top-N, no global sort
    "pq60_training_mix" -> 7,       // dedup 1 (cached scored stage, executes once) + gate 3 + cap heap 1 + residue rank window 1 + census 1
    "pq61_label_balance" -> 3,      // census + target aggs; k broadcast, replication row-local
    "pq64_incremental_mix" -> 9,    // prev⋈new id join 2 + keeper election 1 + gate 3 + cap heap 1 + rank 1 + census 1; both artifacts cached, scorer only on the change set
    "pq65_pq_adc" -> 1,             // codes scanned once, queries+tables broadcast; the only exchange is the bounded-heap top-k
    "pq66_knn_ivfpq" -> 3,          // coarse assign agg + index id join + heap; probes/tables/centroids all broadcast
    "pq67_media_fingerprints" -> 0, // row-local: frame explode + 60 region hashes, no shuffle
    "pq68_bpe_tokens" -> 0,         // row-local native greedy-loop encode, merges ride the plan
    "pq69_key_skew" -> 2,           // key partial-agg + total agg (broadcast back); TakeOrdered top-K
    "pq70_rank_eval" -> 4,          // ADC heap + exact-top1 heap + the (query, nbr) rank join
    "pq71_repetition_removal" -> 0, // row-local segment keep-first filter, no shuffle
    "pq72_span_removal" -> 2,       // gram election agg + affected-positions agg; reassembly is row-local (native merge-scan), text shuffles once for the doc join
    "pq73_markup_extract" -> 0,     // row-local regexp chain, zero shuffle
    "pq74_scrub_mix" -> 11,         // span stages 4 (gram election + affected-pos agg + doc-keyed rm join, one corpus-text exchange) + meta re-join + dedup 1 (cached) + gate 3 + cap heap 1 + rank 1 (+ census broadcast); one more Exchange NODE than the old explode-join shape but 3 fewer corpus-sized ones — the per-token struct shuffles are gone
    "pq75_source_quality" -> 9,     // q21's two-pass exact-rank machinery x 2 percentiles + final per-source agg
    "pq76_leakage_safe_split" -> 1, // one canonical-hash election shuffle; split decision row-local
    "pq77_compression_quality" -> 0, // row-local native deflate, no shuffle
    "pq78_target_mix" -> 1,          // census agg; rates broadcast back, keep row-local
    "pq79_oov_rate" -> 2,            // vocab count agg (TakeOrdered, broadcast back) + per-group agg
    "pq62_maxsim_topk" -> 3,        // per-qframe max + per-doc sum + bounded heap; qframes broadcast
    "pq63_term_drift" -> 3,         // two vocab-sized count aggs + the full-outer term merge
    "q01_pricing_summary" -> 1, "q04_multi_join" -> 3, "q27_cube" -> 2,
    "q28_pivot" -> 2)

  /** Queries whose REGISTERED form legitimately ends in a local relation:
    * pq23's cluster table is the driver-union-find residue at test scale
    * (sub-threshold pair count — see Dedup.connectedComponents), so its
    * final plan has no codegen span by construction. The distributed jump
    * loop's plan properties are exercised directly by
    * PipelinePropertySpec's forced-threshold runs. pq50's greedy MMR
    * selection is driver-resident over a bounded queries×m candidate set
    * by design (k-means-style residency); its corpus-scale inputs are
    * audited by the dedicated test below.
    */
  /** dq25's registered frame is the driver-collected emission log of a
    * finished streaming query (bounded: one row per closed window); the
    * distributed plans are the per-batch stateful aggregations inside the
    * stream, exercised live by the query itself and by
    * StreamingPipelineSpec.
    */
  /** pq97 (r19): the takedown delta is driver-computed (one guarded
    * collect of the takedown-bounded edge+survivor union, union-find in
    * place — see Dedup.reElectAfterDeletion's fast path), so like pq23 its
    * final frame is a LocalTableScan with no codegen span; the distributed
    * fallback past the threshold is pinned by DedupSpec's equivalence
    * test. pq100 (r19): the registered frame is ONE Project over the
    * graft-warc scan, and url_canonicalize's percent-normalize is an
    * ArrayTransform — a higher-order function, CodegenFallback by Spark
    * design — so the single stage legitimately carries no whole-stage
    * span (the same chain inside pq83-pq91 sits under codegen'd agg/join
    * stages, which is where their spans come from).
    */
  /** pq106 (r21): integerPageRank's sub-threshold fast path computes the
    * rank recurrence on the driver off one limit-guarded collect (the
    * unionFindLocal posture), so the registered frame is a LocalTableScan
    * with no codegen span; the distributed RDD loop past the threshold is
    * pinned bit-identical by LinkGraphSpec.
    */
  private val localResidue =
    Set("pq23_dedup_clusters", "pq50_knn_mmr", "dq25_stream_drift_refresh",
      "pq97_deletion_reelect", "pq100_warc_index", "pq106_link_pagerank")

  /** UNPARTITIONED-window allowlist: the only sanctioned global windows are
    * cumulative/rank windows over bounded METADATA frames, never over the
    * corpus —
    *   - `Calibrate.calibratedFilter` (quality/Calibrate.scala): cumulative
    *     count over the DISTINCT integer scores (≤ a few thousand rows) to
    *     derive the keep threshold — carried by pq57 and, through the mix
    *     pipelines' gate stage, pq60/pq64/pq74;
    *   - `CorpusStats.zipfFit` (quality/CorpusStats.scala): rank over the
    *     already-TakeOrdered top-N terms (N ≤ hundreds) — pq59.
    * Every other registered query must have ZERO: a global window over a
    * data-sized frame is the canonical accidental scale-killer ("Moving all
    * data to a single partition"), and before this list it was
    * indistinguishable from the sanctioned sites in a warning sweep.
    */
  /** Round-robin-spread allowlist (mirrors globalWindowAllow): exactly the
    * queries that intentionally call [[Tables.spreadForRowWork]] on their
    * input (directly or through the shared lshSigsAndPairs helper), at most
    * one spread exchange each. pq23/pq97 also call the helper but pin the
    * pair lineage with localCheckpoint, so their registered plans show no
    * spread — they stay at the 0 default. Upper bounds: a conditional
    * spread that self-disables (multi-split input, low parallelism) still
    * passes.
    */
  private val spreadAllow = Map(
    "dq30_bm25_incremental" -> 1,
    "pq02_minhash_sigs" -> 1,
    "pq03_lsh_pairs" -> 1,
    "pq05_simhash_pairs" -> 1,
    "pq06_jaccard_pairs" -> 1,
    "pq105_link_graph" -> 1,
    "pq107_anchor_text" -> 1,
    "pq18_dup_spans" -> 1,
    "pq24_neardup_survivors" -> 1,
    "pq25_minhash_verify" -> 1,
    "pq37_pii_redaction" -> 1,
    "pq53_bm25_topk" -> 1,
    "pq68_bpe_tokens" -> 1,
    "pq73_markup_extract" -> 1,
    "pq84_gopher_rules" -> 1)

  private val globalWindowAllow = Map(
    "pq57_calibrated_quality" -> 1,
    "pq59_zipf_fit" -> 1,
    "pq60_training_mix" -> 1,
    "pq64_incremental_mix" -> 1,
    "pq74_scrub_mix" -> 1)

  test("every registered query keeps its pushdown/broadcast/codegen plan shape") {
    // static audit needs AQE off so pre-execution plans carry codegen ids
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // pin the COLD plan: earlier suites may have executed the cache-using
    // pipelines (pq60/pq64 persist their scored stage), and a POPULATED
    // InMemoryRelation carries real size stats that can flip a small join
    // from broadcast to sort-merge — a runtime state, not a plan regression
    spark.catalog.clearCache()
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val f = Explain.audit(fn(spark, sfDir))
        Seq(
          (f.wideReads == 0) ->
            s"$name reads an un-pruned (>400-char) schema — column pruning lost",
          (localResidue(name) || f.codegenSpans >= 1) ->
            s"$name has no whole-stage codegen span",
          (!mustPush(name) || f.pushedFilters) ->
            s"$name lost its pushed filters",
          (f.broadcastJoins >= mustBroadcast.getOrElse(name, 0)) ->
            s"$name broadcasts ${f.broadcastJoins} < expected ${mustBroadcast.getOrElse(name, 0)}",
          (f.exchanges <= maxShuffles.getOrElse(name, Int.MaxValue)) ->
            s"$name shuffles ${f.exchanges} > budget ${maxShuffles.getOrElse(name, 0)} — an Exchange crept in",
          (f.globalWindows <= globalWindowAllow.getOrElse(name, 0)) ->
            (s"$name has ${f.globalWindows} unpartitioned window(s), allowed " +
              s"${globalWindowAllow.getOrElse(name, 0)} — a single-partition sort over " +
              "data-sized input crept in (only bounded-metadata windows are sanctioned)"),
          // r20 input spreads (Tables.spreadForRowWork — round-robin
          // parallelization of a sub-split scan, identity at scale),
          // per-query allowlist since r21 (ADVICE): the default budget is
          // ZERO, so a future keyless data-scale repartition() in any of the
          // ~150 non-spread queries fails the audit instead of hiding under
          // a blanket allowance
          (f.spreads <= spreadAllow.getOrElse(name, 0)) ->
            (s"$name has ${f.spreads} round-robin exchanges, allowed " +
              s"${spreadAllow.getOrElse(name, 0)} — a keyless repartition crept in " +
              "(only the sanctioned Tables.spreadForRowWork sites may round-robin)")
        ).collect { case (false, msg) => msg }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q21/pq75 keep the effective-count-0 shared-scan shape (no pushdown BY DESIGN)") {
    // the inverse pin of mustPush (see its doc comment): if a pushed filter
    // REAPPEARS on these scans, someone filtered nulls before the exact-rank
    // aggregate — the plan forks into the measured-worse double-scan and the
    // c=0 census contract is broken. Fail loudly toward the rationale.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("q21_percentile", "pq75_source_quality").foreach { name =>
        val f = Explain.audit(SparkEntry.queries(name)(spark, sfDir))
        assert(!f.pushedFilters,
          s"$name scan has pushed filters again — the effective-count-0 rework " +
            "deliberately removed the scan-level not-null filter so null rows flow " +
            "to the aggregate with c=0 on ONE shared subtree (PlanAuditSpec mustPush " +
            "doc); re-adding it forks the corpus scan (+1/+2 exchanges, measured r13)")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("one connected-components round keeps its label-shuffle budget") {
    // the registered pq23 plan reports shuffles=0 (localCheckpoint truncates
    // lineage) — this pins the budget that actually repeats per round, per
    // phase, exactly as the loop runs it (jump over the PINNED propagate):
    //   propagate ≤ 3 live Exchanges = the ONE pre-paid edges repartition(v)
    //     the real loop pays outside the loop + labels→v + partial-agg min;
    //   jump ≤ 1 live Exchange = the lbl-keyed probe side (the j_id side
    //     reuses the pin's preserved hashpartitioning(id), no Exchange).
    // Auditing the jump over a lazy propagate frame would instead show the
    // whole propagate subtree planned on BOTH join sides (the r6 red-test
    // bug) — the pin is what makes propagate execute once per round.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (p, j) = Explain.ccRoundFacts(spark)
      assert(p.exchanges <= 3,
        s"cc propagate shuffles ${p.exchanges} > 3 — an Exchange crept into the label loop: $p")
      assert(j.exchanges <= 1,
        s"cc jump shuffles ${j.exchanges} > 1 — the pinned self-join lost its co-partitioning: $j")
      assert(p.codegenSpans >= 1, s"cc propagate lost whole-stage codegen: $p")
      assert(j.codegenSpans >= 1, s"cc jump lost whole-stage codegen: $j")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("pq97's forced fallback keeps the distributed re-elect delta's plan shape") {
    // the registered pq97 plan is the guarded driver fast path
    // (LocalTableScan — the localResidue entry); this pins the OTHER shape,
    // the one a takedown wave past the guard actually runs: sub-graph CC +
    // survivor join + delta aggregation. Forcing collectThreshold below the
    // survivor count takes the fallback branch; the sub-CC itself collapses
    // to its checkpointed labels, so the LIVE plan is the survivors join
    // (broadcast or shuffled by stats) + one partial-agg delta shuffle +
    // the keeper-moved filter. Budget: ≤ 4 Exchanges (join sides + agg),
    // ≥ 1 whole-stage span, and ≥ 1 Exchange proves the fallback (not the
    // fast path's LocalTableScan) was audited.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import spark.implicits._
      // one 400-node chain: every doc in one cluster, takedowns split it
      val pairs = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
        .repartition(4).localCheckpoint()
      val clusters = graft.dedup.Dedup.connectedComponents(pairs)
      val removed = spark.range(0, 400, 5).toDF("id")
      val delta = graft.dedup.Dedup.reElectAfterDeletion(
        pairs, clusters, removed, collectThreshold = 8)
      val f = Explain.audit(delta)
      assert(f.exchanges >= 1,
        s"threshold 8 did not force the distributed fallback (LocalTableScan?): $f")
      assert(f.exchanges <= 4,
        s"fallback delta shuffles ${f.exchanges} > 4 — an Exchange crept in: $f")
      assert(f.codegenSpans >= 1, s"fallback delta lost whole-stage codegen: $f")
      // and the two paths agree on the same input (the spec-level twin of
      // DedupSpec's equivalence case, kept here so the audit can't drift
      // from semantics)
      val fast = graft.dedup.Dedup.reElectAfterDeletion(pairs, clusters, removed)
      assert(delta.collect().toSet == fast.collect().toSet,
        "fallback and fast-path deltas diverged")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("mmr's corpus-scale inputs keep their broadcast/shuffle shape") {
    // the registered pq50 plan is the driver-greedy residue; the plans that
    // touch the corpus are (a) the int8 scoring scan — the pq31 path, one
    // broadcast query join + one bounded-heap exchange — and (b) the
    // candidate-vector fetch, which must be a broadcast SEMI-join with zero
    // data Exchange (an isin-literal or shuffled-join regression here scans
    // or shuffles the 100 TB corpus per MMR call)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = Tables.embeddings(spark, sfDir)
      val scoring = graft.similarity.Knn.int8TopK(
        e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", k = 10)
      val sa = Explain.audit(scoring)
      assert(sa.broadcastJoins >= 2, s"scoring lost its query broadcast: $sa")
      assert(sa.exchanges <= 1, s"scoring exceeds its one heap-agg exchange: $sa")
      val fetch = graft.similarity.Knn.mmrCandidateFetch(
        e, "vec_id", "embedding", Seq(1L, 2L, 3L))
      val fa = Explain.audit(fetch)
      assert(fa.broadcastJoins >= 2, s"candidate fetch lost its broadcast semi-join: $fa")
      assert(fa.exchanges == 0, s"candidate fetch shuffles the corpus: $fa")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
