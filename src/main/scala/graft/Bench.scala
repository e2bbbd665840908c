package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Headline = the operator families a user would actually run hot:
  * star-join BI ranks, grouped aggregation, windows, dedup (exact + LSH),
  * similarity search, text analysis, and one graph-set-algebra query.
  * The open-ended iterative algorithms (Brandes, projected PageRank over
  * the dense co-purchase graph) are correctness surface, not throughput
  * surface — they're still in Verify, just not timed here.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "agg_lineitem_pricing",
    "q01_rank_customers_by_order_count",
    "q02_rank_customers_by_spend",
    "q05_rank_orders_by_price",
    "q08_rank_nations_by_revenue",
    "q11_rank_suppliers_by_revenue",
    "m_hindex",
    "m_gindex",
    "w3_running_sum_per_customer",
    "o6_latest_event_per_user",
    "st_window_counts",
    "evt_sessionize",
    "evt_asof_purchase",
    "evt_range_join",
    "dd_exact_dedup",
    "dd_minhash_lsh_neardup",
    "dd_simhash_pairs",
    "txt_quality",
    "txt_langid",
    "txt_fingerprint",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "sim_quantized_rerank",
    // late-r7 additions a user runs hot: the PQ-ADC scan (the
    // billion-vector ANN path), PII redaction (every pre-training
    // pipeline's mandatory pass), corpus bigram-LM estimation, and BPE
    // tokenizer training (vocabulary-bounded rounds)
    "sim_pq_topk",
    "txt_pii_scrub",
    "lm_bigram",
    "bpe_merges",
    "g_jaccard_parts",
    "g_pattern_scan",
    // r7 promotions (VERDICT r6 #4) end with the one bounded-iteration
    // graph algorithm: 6 fixed louvain rounds on the sparse REFERENCES
    // chain — unlike Brandes/projected-PageRank this is shuffle-bounded
    // work a user would run hot, so it belongs in the throughput surface
    "g_louvain",
    // r8 promotions (VERDICT r7 #5): the remaining r7-new operators a
    // pipeline runs hot — two-level Louvain, containment near-dup,
    // eval-set decontamination, sequence packing, hybrid RRF retrieval.
    // dd_containment is the LABELED exact all-pairs baseline (Σdf² join):
    // its first sf0.1 timing measured 42 s at local[4] — quadratic by
    // design, the LSH family is the scale path — but it stays timed so
    // the cost of the exact baseline is a recorded number, not a guess.
    "g_louvain2",
    "dd_containment",
    "decon_ngram_overlap",
    "pack_sequences",
    "hyb_rrf_topk",
    // r8-new operator surface: the IVF×PQ billion-vector composition
    // (plain + residual-codebook IVFADC) and the composed end-to-end
    // training-data pipeline.
    "sim_ivf_pq_topk",
    "sim_ivfpq_residual_topk",
    "pipe_end_to_end",
    // second-wave r8 operators: duplicate-span cutting (the cheapest
    // dedup pass — one exchange, no candidate join), SemDeDup semantic
    // dedup, per-vector PCA projection (power iteration + scoring), and
    // the GD-distilled quality filter
    "dd_dup_spans",
    "dd_semdedup",
    "emb_pca_scores",
    "qc_distill_scores",
    "pipe_embeddings",
    "g_triangles",
    "dd_span_cut",
    "export_shards",
    "mm_decode_audio",
    // final r8 additions: the 48-bit SimHash configuration (the
    // documented scale setting — band volume far below the saturated
    // 32-bit run), data-derived temperature mix, per-stratum reservoir,
    // and the SQL-text native-function path
    "dd_simhash_wide_pairs",
    "mix_temp_sample",
    "mix_reservoir",
    "sql_entry_native_grams",
    // third-wave r8 operators: the new bounded-iteration graph family
    // (k-core H-operator rounds, HITS renormalized fixed point, sampled
    // harmonic closeness, weighted/personalized PageRank — all
    // constant-shuffles-per-round), degree centrality, the interpolated
    // trigram LM, curriculum phase assignment, and the OPQ-lite
    // permuted-PQ scan
    "g_degree",
    "g_kcore",
    "g_hits",
    "g_harmonic",
    "g_pagerank_weighted",
    "g_ppr_sample",
    "lm_trigram",
    "mix_curriculum",
    "sim_opq_topk",
    "g_fastrp",
    "txt_blocklist",
    "txt_gopher_gate",
    "evt_funnel",
    "g_pipe_communities",
    "lm_trigram_surprise",
    "sim_recall_eval",
    "agg_cube_orders",
    "evt_retention",
    "g_sssp",
    "g_bellman_ford",
    "mix_upsample",
    "mm_resize",
    "g_fastrp_topk",
    "g_random_walks",
    "g_node2vec_walks",
    // r9 additions: directed SCC (parallel FW-BW refinement), the walk
    // training stack's co-occurrence + PMI-embedding stages, and the
    // real multi-frame container decode
    "g_scc",
    "g_walk_cooc",
    "g_pmi_embed",
    "mm_frame_sample",
    // r9 wave 3: star-contraction CC (the log-round 100 TB CC), semantic
    // eval-set decontamination, and BM25 keyword retrieval
    "g_components_star",
    "decon_semantic",
    "txt_bm25_topk",
    // r9 wave 4: z-score anomaly flags, Type-2 SCD history, contrastive
    // hard-negative mining, k-truss community cores
    "evt_zscore_anomaly",
    "d7_scd2_history",
    "g_hard_negatives",
    "g_ktruss",
    "pipe_corpus_card",
    "lay_zorder",
    "g_eccentricity",
    "evt_hourly_top_users",
    "g_pmi_embed2",
    "agg_exact_median",
    // r10 promotions (VERDICT r9 #1): the remaining heavy oracle-only
    // entries enter the timed headline so the repo's most expensive
    // plans have recorded wall times — sampled Brandes, LPA, the
    // co-purchase PageRank, LSH cluster resolution, and the BPE
    // vocab/encode lifecycle stages. The projected-rank family
    // (g_articlerank_*/g_pagerank_institutions — the reference's
    // UNCAPPED *1..10 closure, graph_queries.cyp:48-72) was measured
    // and does NOT fit the 20 GB driver at sf0.1 (every run OOMs,
    // exit 52: the REFERENCES graph at sf0.1 has avg degree ~27, so
    // the closure saturates toward |V|² ≈ 4·10⁸ pairs before the
    // author-author projection multiplies it) — their recorded sf0.1
    // cost lives in BASELINE.md's round-10 audit (measured at a 90 GB
    // driver), the sf0.01 oracle keeps verifying them, and `maxPairs`
    // is the documented deploy knob. Keeping OOM-by-semantics queries
    // out of the timed set keeps the driver bench 0-failed.
    "g_betweenness_sample",
    "g_lpa_communities",
    "g_pagerank_parts",
    "dd_neardup_clusters",
    "bpe_vocab",
    "bpe_encode",
    // r10 G7 additions: overlap + weighted-Jaccard node similarity
    "g_overlap_parts",
    "g_wjaccard_parts",
    // r10 depth wave: Newman assortativity, deterministic HLL, token
    // entropy, CCNet perplexity buckets, nDCG/MRR retrieval eval
    "g_assortativity",
    "sketch_hll_exact",
    "txt_entropy",
    "mix_ppl_buckets",
    "ret_ndcg_eval",
    "agg_exact_p90",
    "agg_histogram",
    // the closure-family deploy knob, oracle-checked and timed: at
    // sf0.1 the 1M-pair cap binds after hop 1 — the loud early stop is
    // exactly the behavior the uncapped family's OOM finding mandates
    "g_khop_capped",
    // r11 completeness promotion (VERDICT r10 #2): every remaining
    // oracle entry enters the timed headline — mostly sub-second
    // variants of already-benched plans — so the timed set equals the
    // FULL oracle surface minus the four measured closure exclusions
    // (g_articlerank_customers/_venues/_gdsnorm, g_pagerank_institutions
    // — the uncapped *1..10 projections that cannot fit the 20 GB
    // driver at sf0.1; see the r10 comment above).
    "d1_dedup_keep_first", "d2_upsert_dim", "d3_surrogate_keys",
    "dd_ngram_jaccard", "dd_simhash", "emb_pca_component",
    "evt_json_extract", "evt_session_window", "f_scalar_gauntlet",
    "g_2hop_reach", "g_components", "g_edges_build", "g_jaccard_capped",
    "g_modularity", "j11_semi_join_big_spenders",
    "j3_anti_join_parts_never_ordered", "lm_surprise", "m_euclidean",
    "mix_stratified_sample", "mix_temp_rates", "mm_decode_image",
    "mm_media_table", "p1_filter_regex", "p3_null_filter",
    "p4_length_filter", "q03_rank_customers_by_hindex",
    "q04_rank_customers_by_gindex", "q06_rank_nations_by_order_count",
    "q07_rank_nations_by_orders_period", "q09_rank_nations_by_avg_order",
    "q10_rank_suppliers_by_item_count", "q12_rank_suppliers_by_avg_price",
    "q13_rank_suppliers_promo_parts", "q14_years_by_order_count",
    "q15_promo_orders_histogram", "qc_distill_weights",
    "quantiles_by_lang", "rollup_orders", "sim_exact_near_pairs",
    "sim_ivf_assign", "sim_ivf_probe2", "sim_kmeans_centroids",
    "sim_lsh_near_pairs", "sim_pq_codes", "sim_quantized_topk",
    "sketch_approx_distinct", "skew_salted_join_agg", "skew_salted_sum",
    "sql_entry_rank_orders", "stats_by_lang", "topk_orders",
    "txt_bpe_tokens", "txt_inverted_index", "txt_keywords",
    "txt_oov_rate", "txt_repetition", "txt_token_stats",
    "u1_union_all_names", "win_analytics",
    // r11-new mergeable sketches (count–min, q-digest, KMV set-ops) +
    // the lossy JPEG codec roundtrip
    "sketch_cm_exact", "sketch_qdigest", "mm_decode_jpeg",
    "sketch_kmv", "sketch_kmv_jaccard",
    // r12: mergeable Bloom filter + the runtime semi-join prune, the
    // lossless animated-GIF multi-frame roundtrip, and Misra–Gries
    // heavy hitters
    "sketch_bloom", "sketch_bloom_prune", "mm_decode_gif", "sketch_mg",
    "sketch_mg_weighted",
    // r16 (VERDICT r15 #1): g_articlerank_capped — the r13 heavy-tier
    // entry — leaves the TIMED set: one number cost ~180 s quiet to
    // ~320 s windy of the driver's 60-minute wall (warm-up + run +
    // steal-gated retry), and the r15 driver kill landed on exactly
    // that query. The family stays priced by g_articlerank_tightcap:
    // the SAME closure-capped chain under the attachment-degree hub
    // cap (Graph.capAttachment — the knob that actually bounds the
    // ~147 M-edge projection at sf0.1, where the closure cap already
    // binds after hop 1). g_articlerank_capped itself remains fully
    // oracle-checked at sf0.01 in Verify and spot-profiled in
    // ProfileArcCapped — its sf0.1 single-run cost is recorded in
    // BASELINE.md (r15 definitive: 89.4 s), not re-measured per round.
    "g_articlerank_tightcap",
    // r13: deterministic priority sampling — the mergeable weighted
    // sample completing the sketch family
    "sketch_psample",
    // r14: VarOpt — the variance-optimal batch sampler beside it
    "sketch_vosample",
    // r15: the sharded VarOpt merge — shard states re-sampled under
    // their grid-snapped adjusted weights, the distributed fold
    "sketch_vomerge",
    // r16: fixed-budget overlapping document chunking — the RAG /
    // pretraining windowing pass (tokenize once → explode(sequence) →
    // slice; one narrow stage, no shuffle before the output order)
    "txt_chunk_docs")

  /** HEAVY tier: entries here get a recorded wall time (warm-up + ONE
    * timed run) instead of the multi-run protocol — for queries whose
    * single-run cost is large enough that repeated runs would dominate
    * the bench wall. Telemetry marks them `"heavy":true`.
    *
    * EMPTY since r16: the one member, `g_articlerank_capped` (~89 s/run
    * at sf0.1), left the timed headline entirely (see its comment in
    * [[headline]]) — its tighter-cap bench twin runs in the mid tier.
    * The tier machinery stays: any future >30 s/run entry belongs here,
    * and heavy entries remain exempt from [[MidRetryBudget]]. */
  val heavy: Set[String] = Set.empty

  /** MID tier (VERDICT r14 #1 — the driver's r14 bench DNF'd at its
    * 60-minute wall cap, rc=124: warm-up + 5 timed runs priced the ~26
    * non-heavy queries with >5 s medians at ~1,460 s of wall by
    * themselves, and r13's successful driver run already used 3,245 s
    * of the ~3,600 s budget). Mid entries run warm-up + TWO timed runs
    * (MIN reported, `"mid":true` in telemetry) plus the steal-gated
    * retry — ~730 s of wall saved while min/max spread telemetry and
    * weather protection are kept. Membership is every non-heavy query
    * whose r14 definitive median exceeded 5 s (BENCH_r14, commit
    * 7b1e5b4) — a STATIC set, so tier assignment can't wobble with the
    * weather and cross-round numbers stay like-for-like within a tier.
    * r16 adds `g_articlerank_tightcap` (the capped projected-rank
    * bench configuration, ~10 s/run at sf0.1 — measured this round).
    * r17 removes `mm_decode_gif` (13.1 → 0.79 s) and `mm_frame_sample`
    * (4.6 → 0.73 s): the codec fan-out (`Multimodal.fannedIds` +
    * memory-backed ImageIO streams) dropped them far below the 5 s
    * class, so they migrate to the 3-run tier — their reported value
    * switches min-of-2 → median-of-3, the documented tier-migration
    * systematic (BASELINE.md r17). The r17 optimization pass likewise
    * migrates `sketch_qdigest` (6.2 → 2.6 s quiet after the single-pass
    * qdCompress rewrite, OPTIMIZATION_r17.md). */
  val mid: Set[String] = Set(
    "g_pipe_communities", "g_hits", "g_louvain2",
    "g_pagerank_parts", "pipe_end_to_end", "g_pmi_embed2", "g_modularity",
    "dd_containment", "g_betweenness_sample", "g_pagerank_weighted",
    "g_ppr_sample", "g_lpa_communities", "g_kcore", "g_pmi_embed",
    "dd_ngram_jaccard", "g_hard_negatives", "g_louvain",
    "g_node2vec_walks", "g_fastrp_topk", "g_scc",
    "dd_simhash_pairs", "g_2hop_reach", "dd_simhash_wide_pairs",
    "g_articlerank_tightcap")

  /** A query's measurement tier. */
  private[graft] def tierOf(name: String): String =
    if (heavy.contains(name)) "heavy"
    else if (mid.contains(name)) "mid"
    else "three_run"

  /** The mid tier's STATIC cost-descending run order — r15 definitive
    * walls (commit bbe2b1f; `g_articlerank_tightcap` from its r16
    * first measurement, 24.8 s; the two mm_* entries left with the r17
    * codec fan-out). Static like the membership itself, so the order
    * can't wobble with the weather and the partial artifact's line
    * order stays comparable across rounds. */
  private[graft] val midOrder: Seq[String] = Seq(
    "g_articlerank_tightcap", // 24.8 s
    "g_betweenness_sample",   // 19.9
    "g_pipe_communities",     // 18.4
    "g_louvain2",             // 17.9
    "g_hits",                 // 17.5
    "g_pagerank_parts",       // 13.7
    "g_lpa_communities",      // 12.4
    "g_pmi_embed2",           // 11.2
    "pipe_end_to_end",        // 10.8
    "g_pagerank_weighted",    // 10.3
    "g_modularity",           // 10.1
    "g_ppr_sample",           //  9.7
    "dd_containment",         //  7.8
    "g_louvain",              //  7.7
    "g_pmi_embed",            //  7.6
    "g_kcore",                //  7.5
    "dd_ngram_jaccard",       //  7.3
    "g_scc",                  //  6.8
    "dd_simhash_wide_pairs",  //  6.4
    "g_hard_negatives",       //  6.3
    "g_node2vec_walks",       //  5.9
    "dd_simhash_pairs",       //  5.9
    "g_fastrp_topk",          //  5.5
    "g_2hop_reach")           //  5.1

  /** EXECUTION order (VERDICT r15 #2): cost-descending — heavy first,
    * then the mid tier in [[midOrder]] (its own static cost-descending
    * order), then the 3-run tier in [[headline]] declaration order. The
    * r15 driver kill landed on query 179/182 — the single most
    * expensive entry in the suite — while 80 sub-second entries sat
    * safely measured in front of it; with the expensive work first, a
    * wall-clock kill strands only the cheapest numbers, and the
    * incremental partial's FIRST lines are the ones that are hardest
    * to re-measure. */
  val execOrder: Seq[String] =
    headline.filter(heavy.contains) ++ midOrder ++
      headline.filterNot(n => heavy.contains(n) || mid.contains(n))

  /** Steal gate for the heavy/mid tiers' retry (VERDICT r13): a 1–2-run
    * entry has little spread to flag weather, so one windy window owns
    * the number (BENCH_r13: 170.2 s vs 75.3 s quiet on identical code —
    * 30% of the driver's headline). If the hypervisor stole more than
    * this many PERCENTAGE POINTS of CPU (0.3 ⇒ a 0.3% steal share —
    * NOT a 0.3 fraction; the comparison value is already 0–100-scaled)
    * during the entry's timed runs, one extra run happens and the
    * minimum is reported (`"retried":true` in telemetry) — bounded cost
    * (≤ 1 extra run), and a gust can no longer dominate the cross-round
    * comparison. */
  val HeavyRetryStealPct = 0.3

  /** Total mid-tier retries allowed per bench run. The retry exists for
    * the SINGLE-GUST failure mode; under SUSTAINED wind every mid entry
    * trips the gate (first r15 full run: 3.4% mean steal, 23 retries ≈
    * +400 s of wall — exactly the budget overrun the mid tier was built
    * to prevent) and the retry is as windy as the runs it replaces.
    * Capping mid retries bounds the sustained-wind wall cost at ~6 extra
    * runs while leaving the single-gust scenario (1–2 retries) fully
    * protected. HEAVY entries are exempt from the budget — a single-run
    * entry needs the retry most. */
  val MidRetryBudget = 6

  /** Explicit-GC gate (VERDICT r15 #1): the r15 protocol forced a full
    * `System.gc()` before EVERY entry — 182 full GCs on a 100 GB heap,
    * most of them ahead of sub-second queries whose timed runs cannot
    * absorb a multi-second pause anyway. The GC's two jobs (release
    * ContextCleaner-held broadcast/shuffle state; clear unpersisted
    * block garbage before it bills a LATER query's timed run — see the
    * per-run sweep note in `main`) only matter for entries long enough
    * to swallow a pause, so: GC when the entry's warm-up run exceeded
    * [[GcGateWarmupS]], or when [[GcEveryN]] entries ran without one
    * (bounding cross-query garbage accumulation for a stretch of tiny
    * entries). Forced-GC count and total wall ride the env block
    * (`gc_forced_n`/`gc_forced_s`), so the gate's cost is measured, not
    * guessed. */
  val GcGateWarmupS = 1.0
  val GcEveryN = 10

  /** Wall-budget governor (VERDICT r15 #3 — the rc=0 backstop): once
    * elapsed wall exceeds [[DegradeFrac]] of the budget
    * (`SPARK_GRAFT_BENCH_BUDGET_S`, default [[DefaultBudgetS]] — sized
    * to the driver's 60-minute cap minus JVM/sbt startup), every
    * remaining entry degrades to ONE cold timed run — no warm-up
    * (ADVICE r16: a warm-up would keep each degraded entry at ~2x its
    * run and could still overrun the kill the mode exists to avoid) —
    * with `"degraded":true` telemetry, no retries, no forced GC. A
    * degraded-but-complete BENCH.json beats a killed one; with the
    * r16 protocol cuts this should never trigger, but it mechanically
    * guarantees the driver artifact parses. */
  val DegradeFrac = 0.8
  val DefaultBudgetS = 3300.0

  /** Environment telemetry so a weather-contaminated number can never again
    * masquerade as a regression (VERDICT r7 #1): per-query CPU-steal and GC
    * deltas, plus the min–max spread of the timed runs. A query whose
    * number is inflated by the machine shows high steal / a wide spread; a
    * real plan regression shows neither.
    */
  private[graft] final case class CpuSnap(total: Long, steal: Long, idle: Long)
  private[graft] final case class QueryTel(
      min: Double, max: Double, gcMs: Long, stealPct: Option[Double],
      retried: Boolean = false, degraded: Boolean = false)

  /** One measured entry: the reported value, its telemetry, the entry's
    * full wall cost (warm-up + GC + timed runs + retry — what the entry
    * actually charged the bench), its tier, and whether the gated GC
    * ran. */
  private[graft] final case class EntryResult(
      name: String, value: Option[Double], err: Option[String],
      tel: Option[QueryTel], wallS: Double, tier: String,
      gcForced: Boolean)

  private[graft] def r3(d: Double): String =
    BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** One query's telemetry object — shared by the final JSON's
    * `telemetry` map and the per-query partial lines so the two can't
    * drift. gc_ms semantics per tier: the 3-run protocol reports the
    * SUM over its timed runs (the r7 semantics, carried through the
    * 5→3 change); heavy/mid report the KEPT (min-wall) run's own gc
    * delta, so a retried entry's gc is the reported run's, not a
    * two-run sum (ADVICE r14). */
  private[graft] def telEntryJson(name: String, t: QueryTel): String = {
    val spread = if (t.min > 0) t.max / t.min else 0.0
    val flagged = spread > 2.0 // median untrustworthy: runs span >2x
    "{\"min\":" + r3(t.min) + ",\"max\":" + r3(t.max) +
      ",\"spread\":" + r3(spread) + ",\"gc_ms\":" + t.gcMs +
      ",\"steal_pct\":" + t.stealPct.fold("null")(r3) +
      ",\"noisy\":" + flagged +
      (if (heavy.contains(name)) ",\"heavy\":true" else "") +
      (if (mid.contains(name)) ",\"mid\":true" else "") +
      (if (t.retried) ",\"retried\":true" else "") +
      (if (t.degraded) ",\"degraded\":true" else "") + "}"
  }

  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  /** One completed query as a self-contained JSON line for the
    * incremental partial artifact (VERDICT r14 #2 — the r14 driver
    * bench was wall-clock-killed at rc=124 and left NOTHING gradable;
    * a line per finished query means a kill still leaves ~all of the
    * run on disk — and it did exactly that for r15). The final
    * BENCH.json supersedes the partial. */
  private[graft] def partialLine(name: String, value: Option[Double],
      err: Option[String], tel: Option[QueryTel]): String =
    "{\"query\":" + jsonStr(name) +
      ",\"value\":" + value.fold("null")(_.toString) +
      ",\"err\":" + err.fold("null")(jsonStr) +
      ",\"telemetry\":" + tel.fold("null")(telEntryJson(name, _)) + "}"

  /** Durable single-line append: open-append-close per line, so a
    * kill -9 between queries leaves every prior line complete (a
    * mid-write kill can truncate only the LAST line — a JSONL reader
    * skips it). */
  private[graft] def appendLine(path: String, line: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      line + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  private[graft] def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** The whole measurement loop, pure of Spark and the wall clock so
    * BenchSpec can run it against a fake runner (VERDICT r15 #2/#3: the
    * execution order and the budget governor are exactly the seams that
    * must not be tested by a 50-minute bench run).
    *
    * Per entry: untimed warm-up → gated GC → tier protocol (heavy 1 /
    * mid 2 / three_run 3 timed runs) → steal-gated retry (budgeted for
    * mid) → report (min for few-run tiers, median for three_run) →
    * flush one partial line. Once `elapsedS()` crosses
    * `DegradeFrac * budgetS`, remaining entries run ONE cold timed run
    * (no warm-up), skip retries and the forced GC, and carry
    * `"degraded":true`.
    *
    * @param runOnce one timed run: (seconds, gcMsInsideRun, error)
    * @param cpu     /proc/stat snapshot (None where unavailable)
    * @param forceGc the gated full-GC hook (timed by the caller)
    * @param elapsedS seconds since the bench started (governor clock)
    * @param budgetS  wall budget in seconds (governor threshold input)
    * @param flush    sink for each completed entry's partial line
    */
  private[graft] def runSuite(
      names: Seq[String],
      runOnce: String => (Double, Long, Option[String]),
      cpu: () => Option[CpuSnap],
      forceGc: () => Unit,
      elapsedS: () => Double,
      budgetS: Double,
      flush: String => Unit): Seq[EntryResult] = {
    var midRetriesLeft = MidRetryBudget
    // start saturated so the first entry may GC (nothing ran yet, but a
    // prior suite's garbage — the table warm-ups — is live)
    var sinceGc = GcEveryN
    def stealBetween(a: Option[CpuSnap], b: Option[CpuSnap]): Option[Double] =
      for { x <- a; y <- b; if y.total > x.total }
        yield 100.0 * (y.steal - x.steal) / (y.total - x.total)
    names.map { name =>
      val w0 = System.nanoTime()
      val tier = tierOf(name)
      // governor check at entry START: a degraded entry skips runs it
      // hasn't paid for yet, not runs already in flight
      val degraded = elapsedS() > DegradeFrac * budgetS
      // Degraded entries skip the untimed warm-up too (ADVICE r16): the
      // governor exists to dodge the wall kill, and a warm-up costs as
      // much as the single timed run it precedes — paying it would keep
      // each post-governor entry at ~2x its run. The one timed run is
      // therefore COLD; degraded:true already tells the reader so.
      val warm = if (degraded) None else Some(runOnce(name))
      sinceGc += 1
      // Force ONE full GC per gated entry, in the untimed gap after
      // warm-up (r8 driver bench: 15 s of GC pauses concentrated
      // mid-bench, g_louvain alone 5.5 s / 64 s max at 0.02% steal).
      // Two accumulation paths need it: (a) broadcast/shuffle driver
      // state is only released when ContextCleaner's weak refs are
      // collected (its periodic GC defaults to 30 min — far longer than
      // the bench), and (b) unpersisted block memory becomes heap
      // garbage that otherwise bills a LATER query's timed run as a
      // multi-second mid-run pause. Once per gated entry, not per run: a
      // G1 full GC can unload JIT-compiled code, and the first post-GC
      // run re-pays compilation. Gated (r16): see [[GcGateWarmupS]].
      val gcForced = !degraded &&
        (warm.exists(_._1 > GcGateWarmupS) || sinceGc >= GcEveryN)
      if (gcForced) { forceGc(); sinceGc = 0 }
      val fewRuns = tier != "three_run"
      val nRuns =
        if (degraded) 1
        else tier match { case "heavy" => 1; case "mid" => 2; case _ => 3 }
      val cpu0 = cpu()
      val runs0 = (1 to nRuns).map(_ => runOnce(name))
      val cpu1 = cpu()
      // steal% over the query's timed runs: ticks the hypervisor took
      // from this VM while the query ran. >1–2% sustained means the
      // machine, not the plan, owns part of the wall time.
      val steal0 = stealBetween(cpu0, cpu1)
      // r14/r15: weather-harden the few-run tiers — steal-gated retry,
      // min reported (see [[HeavyRetryStealPct]]). The reported steal
      // always covers the kept run's WHOLE measurement window: for
      // keepFirst that window is both original timed runs (the kept
      // run's own moment may have been quieter than the pair's figure —
      // per-run CPU snapshots would cost a snapshot pair per run for a
      // nuance the spread field already exposes), for a kept retry it
      // is the retry's own window (ADVICE r15).
      val mayRetry = !degraded && fewRuns &&
        (tier == "heavy" || midRetriesLeft > 0)
      val (runs, stealPct, retried) =
        if (mayRetry && runs0.exists(_._3.isEmpty) &&
            steal0.exists(_ > HeavyRetryStealPct)) {
          if (tier == "mid") midRetriesLeft -= 1
          val c0 = cpu()
          val again = runOnce(name)
          val c1 = cpu()
          val steal1 = stealBetween(c0, c1)
          val ok0 = runs0.collect { case (t, _, None) => t }
          val keepFirst = again._3.nonEmpty || ok0.min <= again._1
          (runs0 :+ again, if (keepFirst) steal0 else steal1, true)
        } else (runs0, steal0, false)
      val ok = runs.collect { case (t, _, None) => t }
      val firstErr = runs.collectFirst { case (_, _, Some(m)) => m }
      // gc_ms: 3-run tier sums its timed runs; heavy/mid/degraded report
      // the kept (min-wall) run's own delta (ADVICE r14).
      val gcReported =
        if (fewRuns || degraded)
          runs.collect { case (t, g, None) => (t, g) }
            .minByOption(_._1).map(_._2).getOrElse(0L)
        else runs.map(_._2).sum
      val tel =
        if (ok.isEmpty) None
        else Some(QueryTel(ok.min, ok.max, gcReported, stealPct, retried,
          degraded))
      // heavy/mid/degraded entries report the MIN (their 1–2 runs, or
      // the quieter side of the steal-gated retry); the 3-run protocol
      // keeps its median
      val value =
        if (ok.isEmpty) None
        else Some(if (fewRuns || degraded) ok.min else median(ok))
      val errOut = if (ok.isEmpty) firstErr else None
      try flush(partialLine(name, value, errOut, tel))
      catch { case e: Throwable =>
        System.err.println(s"[bench] partial flush of $name failed: $e") }
      EntryResult(name, value, errOut, tel,
        (System.nanoTime() - w0) / 1e9, tier, gcForced)
    }
  }

  private def cpuSnap(): Option[CpuSnap] =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal [guest guestnice]
      Some(CpuSnap(f.sum, if (f.length > 7) f(7) else 0L, f(3) + (if (f.length > 4) f(4) else 0L)))
    } catch { case _: Throwable => None }
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsedS(): Double = (System.nanoTime() - benchT0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .flatMap(_.toDoubleOption).getOrElse(DefaultBudgetS)
    val spark = Sessions.local(cpus, "graft-bench")
    // Experiment hook (local iteration only, like SPARK_GRAFT_BENCH_ONLY):
    // override any SQL conf, e.g. SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case Array("") | Array() => // empty segment from a trailing ';'
        case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (want key=value): '$kv'")
      }
    })
    val qs = SparkEntry.queries
    // Materialize through the noop sink, not count(): count() lets Catalyst
    // drop final sorts/projections (a global ORDER BY costs nothing under
    // count), so timings would under-report the work a real consumer pays.
    // The noop source ships with Spark and evaluates every output row.
    def materialize(name: String): Unit =
      qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Warm-up: touch every table and run one small query so codegen/JIT
    // and file-footer caches don't bill the first timed query. The warm
    // query is the declaration-order head (a sub-second aggregation) —
    // NOT execOrder's head, which is by design the most expensive entry.
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    materialize(headline.head)
    spark.catalog.clearCache()
    // Pre-bench quiesce (VERDICT r10 #7): the driver's r10 run started at
    // loadavg 4.6 — a prior JVM still draining — and wore a uniform ~15%
    // tax. Wait (bounded) for the 1-minute loadavg to fall below 2 before
    // the first timed query; the wait itself is recorded in the env block
    // so a still-high load_before is explained, not silent.
    val quiesceTarget = 2.0
    val quiesceMax = 180 // seconds
    var quiesced = 0
    while (loadAvg() > quiesceTarget && quiesced < quiesceMax) {
      Thread.sleep(5000); quiesced += 5
    }
    val loadBefore = loadAvg()
    val benchCpu0 = cpuSnap()
    // Local-iteration subset filter (comma-separated names). The driver
    // never sets it — and if it IS set, the emitted JSON carries a
    // top-level "subset" marker so a narrowed run can never masquerade
    // as a full 0-failed headline (ADVICE r10).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A subset run must never clobber the committed full headline: default
    // its file to BENCH_subset.json (the "subset" marker still travels in
    // the JSON for whoever reads the line).
    val defaultOut = if (only.isDefined) "BENCH_subset.json" else "BENCH.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    // Incremental flush target: one JSON line per completed query, so a
    // wall-clock kill (the r14 driver DNF) still leaves a gradable
    // artifact. Truncated up front so a stale previous run can't
    // masquerade as this one's progress.
    val partialOut = out.stripSuffix(".json") + "_partial.jsonl"
    try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(partialOut))
    catch { case e: Throwable =>
      System.err.println(s"[bench] reset $partialOut failed: $e") }
    // The real runner: one materialize with its own gc delta, followed
    // by the inter-run sweep. clearCache only covers SQL-cached plans:
    // localCheckpoint'd RDDs (rank boundary pins, the near-dup result)
    // otherwise accumulate in BlockManager storage for the whole bench
    // until the JVM GCs their DataFrames — at which point storage
    // pressure evicts the blocks the persist-reliant queries (LSH dedup,
    // IVF) are actively using, a GC-timing-dependent 3-4x degradation of
    // exactly those queries. Between timed runs nothing is reused, so
    // sweep them all.
    def runOnce(name: String): (Double, Long, Option[String]) = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val err =
        try { materialize(name); None }
        catch { case e: Throwable =>
          Some(e.toString.takeWhile(_ != '\n').take(200))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val gcDelta = gcMillis() - g0 // GC landing INSIDE the timed window
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (dt, gcDelta, err)
    }
    var explicitGcNs = 0L
    def forceGc(): Unit = {
      val t = System.nanoTime()
      System.gc()
      explicitGcNs += System.nanoTime() - t
    }
    val names = execOrder.filter(qs.contains)
      .filter(n => only.forall(_.contains(n)))
    val results = runSuite(names, runOnce, () => cpuSnap(), () => forceGc(),
      () => elapsedS(), budgetS,
      line => appendLine(partialOut, line))
    // A query with no successful run reports null, never a time-to-failure.
    val qJson = results.map { r =>
      "\"" + r.name + "\":" + r.value.fold("null")(_.toString)
    }.mkString("{", ",", "}")
    val failed = results.collect { case r if r.value.isEmpty => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    results.foreach { r =>
      r.err.foreach(m => System.err.println(s"[bench] ${r.name} FAILED: $m"))
    }
    val telJson = results.collect { case r if r.tel.isDefined =>
      "\"" + r.name + "\":" + telEntryJson(r.name, r.tel.get)
    }.mkString("{", ",", "}")
    val benchCpu1 = cpuSnap()
    val benchSteal = for { a <- benchCpu0; b <- benchCpu1; if b.total > a.total }
      yield 100.0 * (b.steal - a.steal) / (b.total - a.total)
    // Per-tier wall decomposition (VERDICT r15 #5): the fits-the-hour
    // question answered by the artifact itself — each tier's summed
    // entry walls (warm-up + GC + timed runs + retries) plus everything
    // outside the measurement loop (session start, table warm-ups,
    // quiesce, JSON assembly) as overhead.
    val wallTotal = elapsedS()
    def tierWall(t: String): Double =
      results.collect { case r if r.tier == t => r.wallS }.sum
    val wallJson =
      s"""{"heavy":${r3(tierWall("heavy"))},"mid":${r3(tierWall("mid"))},""" +
      s""""three_run":${r3(tierWall("three_run"))},""" +
      s""""overhead":${r3(wallTotal - results.map(_.wallS).sum)},""" +
      s""""total":${r3(wallTotal)}}"""
    val envJson =
      s"""{"load_before":${r3(loadBefore)},"load_after":${r3(loadAvg())},""" +
      s""""steal_pct":${benchSteal.fold("null")(r3)},"cpus":"$cpus",""" +
      s""""quiesce_s":$quiesced,"budget_s":${r3(budgetS)},""" +
      s""""degraded_n":${results.count(_.tel.exists(_.degraded))},""" +
      s""""gc_forced_n":${results.count(_.gcForced)},""" +
      s""""gc_forced_s":${r3(explicitGcNs / 1e9)}}"""
    val total = results.flatMap(_.value).sum
    val subsetJson = only.fold("")(names =>
      ",\"subset\":" + names.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]"))
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir","failed":$failed$subsetJson,"telemetry":$telJson,"wall":$wallJson,"env":$envJson}"""
    // stdout goes through sbt, which prefixes "[info]" and breaks the
    // driver's parser (BENCH_r01 "parsed": null) — also write the line to a
    // file and to stderr so a clean copy always survives.
    println(line)
    System.err.println(line)
    // The complete line supersedes the incremental partial artifact
    // (which stays on disk as evidence of the per-query flush).
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
