package graft

import org.scalatest.funspec.AnyFunSpec

/**
 * Plan-shape guards for the scan layer: a query that projects two columns
 * must READ two columns (`ReadSchema`), and filters must reach the parquet
 * scan (`PushedFilters`). These are the properties that decide whether a
 * 100 TB scan reads 100 TB or 2 columns' worth — pinned here so an innocent
 * refactor (a select * upstream, a filter moved above a non-pushable op)
 * fails loudly instead of silently inflating IO.
 */
class PlanAuditSpec extends AnyFunSpec with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  it("every oracle token extraction uses the shared CJK-aware pattern (no drift)") {
    // Spark kernels segment via Text.tokenExtractPattern; a DuckDB oracle
    // still replaying the whitespace-only class would silently diverge the
    // moment the corpus carries CJK — forbid the stale literal, and demand
    // that every CJK-aware literal in the oracle SQL equals the kernel
    // constant VERBATIM (drift in either side fails here, not at the gate)
    val stale = "'[^ \\x09-\\x0D]+'"
    val shared = "'" + functions.Text.tokenExtractPattern + "'"
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains(stale), s"$name replays whitespace-only tokenization")
      // the extraction source must be the EDGE-STRIPPED text (the kernels'
      // [\x00-\x20] strip), never a space-only trim — a trim() source
      // counts edge control bytes in \x00-\x08/\x0E-\x1F as token chars
      // and silently diverges from every Spark kernel
      assert(!sql.contains("regexp_extract_all(trim("),
        s"$name extracts tokens over trim() — use the edge-stripped source")
      // ...and positively: EVERY shared-pattern extraction must read a
      // regexp_replace(-wrapped (edge-stripped) source — a raw column
      // source is the same latent divergence with no trim() to grep for
      var at = sql.indexOf(shared)
      while (at >= 0) {
        val callStart = sql.lastIndexOf("regexp_extract_all(", at)
        assert(callStart >= 0 &&
          sql.substring(callStart, at).contains("regexp_replace("),
          s"$name extracts the shared pattern from a raw (un-edge-stripped) source")
        at = sql.indexOf(shared, at + 1)
      }
    }
    val adopters = SparkEntry.oracleSql.values.count(_.contains(shared))
    assert(adopters >= 50, s"only $adopters oracles carry the shared pattern — " +
      "either the kernel constant changed without regenerating the oracles, or " +
      "extraction sites were rewritten away from the shared literal")
  }

  it("token-shard tokenize+pack plans exactly ONE exchange (the group-sort shuffle)") {
    // the q237 scale claim, pinned: tokenization is a narrow pass riding
    // the scan, and next-fit + bin assembly stream inside the single
    // group-sort exchange — a refactor that sneaks in a join or second
    // shuffle between tokenize and pack fails here
    val docs = SparkEntry.tbl(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val (merges, _) = SparkEntry.ensureTokenizers(spark, dir)
    val vocab = SparkEntry.ensureTokenVocab(spark, dir)
    val seqs = graft.operators.TokenShards.packSequences(
      graft.operators.TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab),
      "doc_id", nShards = 8, capacity = 512L)
    val p = seqs.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, s"expected a single exchange:\n$p")
    // the scan reads only the two consumed columns
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("total (byte-fallback) tokenization is one NARROW pass riding the scan") {
    val docs = SparkEntry.tbl(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val (merges, _) = SparkEntry.ensureTokenizers(spark, dir)
    val vocab = SparkEntry.ensureTokenVocabTotal(spark, dir)
    val p = graft.operators.TokenShards
      .tokenizeToIdsTotal(docs, "doc_id", "text", merges, vocab)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"total tokenization must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("q245 caption extraction is ONE map-side-combined exchange over a doc_id-only read") {
    val p = plan("q245_image_captions")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange (the (src, caption, kind) count):\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  it("q248 planted face: broadcast threshold join + the one cell-count exchange; " +
     "the corpus itself never shuffles") {
    val p = plan("q248_cluster_balance")
    assert(p.contains("BroadcastHashJoin"), s"the per-cell threshold dim must broadcast:\n$p")
    // every hash exchange must be the cell-count aggregation over the
    // grouping key — never the corpus rows (the threshold frame is
    // persisted since round 14 so the guard count and the broadcast share
    // one pass, and the cached sub-plan's agg exchange can print more
    // than once in the dump; the property is WHAT shuffles, not how often
    // the same exchange is rendered)
    val hashEx = "Exchange hashpartitioning\\(([^,]+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("_groupingexpression")),
      s"expected only cell-count aggregation exchanges, got $hashEx:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
    assert(!p.contains("Window"), p)
  }

  it("q250 token-budget mix: broadcast threshold dim + one mass-agg exchange; " +
     "the corpus never shuffles") {
    val p = plan("q250_token_budget_mix")
    assert(p.contains("BroadcastHashJoin"), s"the per-stratum threshold must broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected only the stratum-mass aggregation exchange:\n$p")
    assert(!p.contains("Window"), p)
  }

  it("q21 token count reads ONLY (doc_id, text) from the documents scan") {
    val p = plan("q21_token_count")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("q18 per-status stats prune the orders scan to the aggregated columns") {
    val p = plan("q18_agg_stats")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(!read.contains("o_orderdate") && !read.contains("o_orderpriority"),
      s"scan reads unused columns: $read\n$p")
  }

  it("q25 similarity reads only (vec_id, embedding) and broadcasts the query side") {
    val p = plan("q25_sim_topk")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  it("q43's event-type filter is pushed down to the events scan") {
    val p = plan("q43_range_join")
    assert(p.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*EqualTo\\(event_type,purchase\\)".r.findFirstIn(p).isDefined, p)
  }

  it("q60's range layout plans EXACTLY one exchange (rangepartitioning) + in-partition sort") {
    val p = plan("q60_range_topn")
    assert(p.contains("Exchange rangepartitioning"), p)
    assert("Exchange".r.findAllIn(p).size == 1, s"expected a single exchange:\n$p")
    // the sort is within partitions (no global Sort node above the exchange)
    assert(p.contains("Sort ["), p)
  }

  it("q38 probes the STANDING IVF index (cached assignment scan, no rebuild in the query plan)") {
    val p = plan("q38_ann_ivf")
    assert(p.contains("InMemoryTableScan"),
      s"expected the probe to read the persisted inverted-list assignment:\n$p")
  }

  it("q61 contamination broadcasts the eval side; the only shuffle is the pair-count agg") {
    val p = plan("q61_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange (the (train,eval) count):\n$p")
  }

  it("q227 anchor aggregation is extraction + ONE map-side-combined exchange") {
    val p = plan("q227_anchor_text")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange (the (target, anchor) count):\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$p")
  }

  it("q225 sitemap extraction rides the scan: zero exchanges, doc_id-only read") {
    val p = plan("q225_sitemap_frontier")
    // union of two narrow extraction branches over the same scan
    assert(!p.contains("Exchange"), s"frontier extraction must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  it("q223 audio landmarks ride the scan: zero exchanges, doc_id-only read") {
    val p = plan("q223_audio_peaks")
    assert(!p.contains("Exchange"), s"FFT landmark pass must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  it("q63 repetition metrics run in a single scan with zero exchanges") {
    val p = plan("q63_repetition")
    assert(!p.contains("Exchange"), s"repetition scan must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("q64 top-terms broadcasts the vocabulary df dim") {
    val p = plan("q64_top_terms")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  it("q62 packing plans exactly one exchange (the shard groupSort)") {
    val p = plan("q62_pack_chunks")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"chunking must stay narrow; packing shuffles once on the shard key:\n$p")
  }

  it("q65 incremental probe reads the STANDING minhash index (cached scan, no corpus re-signature)") {
    val p = plan("q65_incremental_dedup")
    assert(p.contains("InMemoryTableScan"),
      s"expected the probe to read the persisted banded-signature index:\n$p")
  }

  it("q67 quantiles shuffle HISTOGRAM mass only: two exchanges, cum-window over the agg frame") {
    val p = plan("q67_per_key_quantiles")
    // histogram agg exchange on (key, value) + key window exchange over the
    // histogram; the final per-key agg reuses the window's partitioning.
    // Both exchanges carry (value, count) rows — domain-bounded, never the
    // corpus — and no window ever partitions raw rows by the skewed key
    assert("Exchange".r.findAllIn(p).size == 2,
      s"expected histogram agg + key-window exchanges only:\n$p")
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0 && p.indexOf("HashAggregate", wIdx) > 0,
      s"the cumulative window must sit ABOVE the histogram aggregate:\n$p")
  }

  it("q69 PII scrub rides the corpus scan: zero exchanges, pruned read") {
    val p = plan("q69_pii_scrub")
    assert(!p.contains("Exchange"), s"scrubbing must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("q70 stratified sample is one narrow filter: zero exchanges, pruned read") {
    val p = plan("q70_stratified_sample")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  it("q72 z-curve is a pure projection: zero exchanges") {
    val p = plan("q72_zorder_curve")
    assert(!p.contains("Exchange"), s"the curve must ride the scan:\n$p")
  }

  it("q73 global top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q73_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"a full Sort node would sort the world for 100 rows:\n$p")
  }

  it("q75 the ENTIRE curation pipeline shuffles exactly once (the dedup hash exchange)") {
    val p = plan("q75_curation_pipeline")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"quality/repetition/sampling/scrub must stay narrow; only exactRows shuffles:\n$p")
    // exactRows is a min_by AGGREGATION, not a row_number window: the plan
    // must show partial (map-side) aggregation — the shuffle then carries one
    // row per distinct content hash per map partition, where the window
    // shuffled EVERY row. (Spark plans SortAggregate here, not HashAggregate:
    // a struct-with-strings buffer isn't UnsafeRow-mutable — but its sorts
    // are local, spill-safe, and partial-aggregated, unlike a window's
    // full-shuffle + post-exchange rank.)
    assert(p.contains("partial_min_by"), s"expected map-side partial aggregation:\n$p")
    assert(!p.contains("Window"), s"expected a min_by canonical pick, not a window:\n$p")
  }

  it("q26 exact all-pairs is a blocked EQUI-join: no cartesian / nested-loop node") {
    val p = plan("q26_embed_sim_pairs")
    assert(!p.contains("CartesianProduct"), s"all-pairs must block, not cross-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs must block, not nested-loop:\n$p")
  }

  it("q76 blocklist: the corpus side anti-joins against a BROADCAST, never shuffles") {
    val p = plan("q76_blocklist_filter")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only hash exchange is the tiny blocklist-distinct, not the corpus
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"corpus must not shuffle; only the blocklist dedup may:\n$p")
  }

  it("q77 rebalance: thresholds broadcast back; the corpus only feeds the tiny count agg") {
    val p = plan("q77_lang_rebalance")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the per-stratum count aggregation may shuffle:\n$p")
  }

  it("q79 snapshot diff joins (id, hash) projections — text never crosses the exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE's wrapper node hides its subtree from collect(); plan shape is
    // identical either way, so pin the non-adaptive tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("q79_snapshot_diff")(spark, dir).queryExecution
      val shuffles = qe.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, qe.executedPlan.toString)
      // each shuffled row is (doc_id, 16-byte content hash, presence lit) —
      // never the text payload
      val leaked = shuffles.flatMap(_.output.map(_.name)).filter(_ == "text")
      assert(leaked.isEmpty, s"payload column crossed a shuffle:\n${qe.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  it("q82 weighted sampling is a narrow scan-speed filter: zero exchanges, two-column read") {
    val p = plan("q82_weighted_sample")
    assert(!p.contains("Exchange"), s"the keep decision is per-row; nothing may shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
  }

  it("q84 bloom prune: the bitset broadcasts as ONE row and the prune filter sits probe-side") {
    val p = plan("q84_bloom_prejoin")
    // the single-row bitset rides a broadcast nested-loop join (trivially
    // tiny); the prune predicate (shiftright bit test) must appear in the
    // plan BELOW the real join, i.e. on the lineitem branch
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("shiftright"), s"expected the codegen'd bit-test prune filter:\n$p")
    // lineitem reads only the join key + aggregated column
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  it("q86 quantized ANN broadcasts the query side; the corpus reads two columns once per branch") {
    val p = plan("q86_quantized_ann")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
  }

  it("q83 Misra-Gries reads ONLY the text column; candidate merge shuffles counters, not tokens") {
    val p = plan("q83_misra_gries")
    assert(p.contains("ReadSchema: struct<text:string>"), p)
    assert(p.contains("MapPartitions"), s"expected the O(k)-state kernel:\n$p")
  }

  it("q90 quantile buckets: cuts shuffle only histogram mass; assignment joins a BROADCAST") {
    val p = plan("q90_quantile_buckets")
    assert(p.contains("BroadcastHashJoin"), p)
    // the cut side shuffles the per-key (value, count) histogram twice
    // (agg + cum-window) — the assignment branch of the corpus never
    // shuffles, and no window partitions raw rows by the skewed key
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"only the histogram agg + cum-window may shuffle:\n$p")
  }

  it("q91 source caps rank through the bounded combiner: one exchange, no Window") {
    val p = plan("q91_source_caps")
    assert(!p.contains("Window"), s"the cap must not window-rank full rows:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"only the O(k)-state combiner merge may shuffle:\n$p")
  }

  it("q92 winsorize: cut join is planner-decided (broadcast at this SF); at most two hash exchanges") {
    val p = plan("q92_winsorize")
    // no forced hint: the planner broadcasts whichever side its stats say is
    // small (at sf0.001 it flips the build side and the final agg REUSES the
    // cut window's partitioning — one exchange total); at scale AQE would
    // shuffle-join instead of OOMing on an O(users) broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"expected at most the cut window + the per-user sum:\n$p")
  }

  it("q93 stopword df: the doc count joins as a 1-row broadcast; terms shuffle once") {
    val p = plan("q93_stopword_df")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the per-term df agg may hash-shuffle:\n$p")
  }

  it("q94 length buckets: narrow bucket assignment, one exchange, text-only read") {
    val p = plan("q94_length_buckets")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"bucket assignment rides the scan; only the group agg shuffles:\n$p")
    assert(p.contains("ReadSchema: struct<text:string>"), p)
  }

  it("q95 dim moments: partial agg collapses exploded rows before the one exchange") {
    val p = plan("q95_dim_moments")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"the shuffle must carry (keys x dims) partials, never exploded rows:\n$p")
    assert(p.contains("partial_sum"), s"expected map-side partial aggregation:\n$p")
  }

  it("q98 robust stats: two histogram passes, medians broadcast back, NO third join") {
    val p = plan("q98_robust_stats")
    assert(p.contains("BroadcastHashJoin"), p)
    // each perKeyExact pass is histogram agg + cum-window (both histogram
    // mass); the median carries through the second pass, never re-joined
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4,
      s"expected the two histogram passes' exchanges (median carried, not re-joined):\n$p")
  }

  it("q99 skew profile plans TakeOrderedAndProject over the count agg — never a global sort") {
    val p = plan("q99_skew_profile")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"top-k must not sort the world:\n$p")
    assert(p.contains("ReadSchema: struct<user_id:bigint>"), p)
  }

  it("q101 source overlap joins on the shingle hash — never a cartesian over docs or groups") {
    val p = plan("q101_source_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"group sizes should broadcast:\n$p")
  }

  it("q102 cohort retention carries only (user_id, week) through its exchanges") {
    val p = plan("q102_cohort_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the on-disk ts type varies across driver data regenerations
    // (TIMESTAMP(NANOS) read as bigint vs timestamp[us] read as NTZ); the
    // pin is COLUMN pruning, not the physical type
    assert(p.contains("ReadSchema: struct<ts:bigint,user_id:bigint>") ||
      p.contains("ReadSchema: struct<ts:timestamp_ntz,user_id:bigint>"),
      s"scan must prune to (ts, user_id):\n$p")
  }

  it("q103 funnel is ONE exchange (the groupSort layout), no window, no join") {
    val p = plan("q103_funnel_stages")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  it("q104 label vote broadcasts the bounded knn/query frames; corpus is never shuffled for a join") {
    val p = plan("q104_label_vote")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"all joins should broadcast the bounded side:\n$p")
  }

  it("q105 edit distance runs the BANDED levenshtein on equi-joined candidates — no cartesian") {
    val p = plan("q105_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.toLowerCase.contains("levenshtein"), s"expected the codegen'd kernel in-plan:\n$p")
  }

  it("q106 conversion lag is ONE exchange (the groupSort layout), no join") {
    val p = plan("q106_conversion_lag")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  it("q111 global quantiles: the histogram agg is map-side combined; no row-level global sort") {
    val p = plan("q111_global_quantiles")
    assert(p.contains("partial_count") || p.contains("partial_sum") || p.contains("HashAggregate"),
      s"expected a map-side-combined histogram aggregation:\n$p")
    // the only Sort allowed is the one over the DISTINCT-VALUE frame (below
    // the histogram aggregate), never over the raw scan
    val scanIdx = p.indexOf("FileScan")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(scanIdx > aggIdx, s"the scan must feed the histogram aggregate directly:\n$p")
  }

  it("q110 session intervals: one groupSort exchange, no Window chain over raw events") {
    val p = plan("q110_session_intervals")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Window"), s"the interval emission must not use lag/running-sum windows:\n$p")
  }

  it("q108 outliers: robust stats broadcast back to the event projection; no extra shuffle") {
    val p = plan("q108_outlier_events")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"the stats frame must broadcast, not co-shuffle:\n$p")
  }

  it("q109 transitions: one groupSort exchange + the count agg; no Window over raw events") {
    val p = plan("q109_transitions")
    assert(!p.contains("Window"), s"adjacent pairs must not use a lag window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  it("q107 vocab growth: the cumulative window runs AFTER the bucket agg, on the tiny frame") {
    val p = plan("q107_vocab_growth")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // the single-partition exchange feeding the running sum must sit above
    // both aggregations — it carries bucket rows, not terms or docs
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"cumulative sum must consume the aggregated bucket frame:\n$p")
  }

  it("q96 repeated spans read the PERSISTED positional window frame; no window function") {
    val p = plan("q96_repeated_spans")
    assert(p.contains("InMemoryTableScan"),
      s"expected the (id, pos, h) frame to be cached for its consumers:\n$p")
    assert(!p.contains("Window"), s"coverage is a distinct-count, never a window:\n$p")
  }

  it("q97 span cut runs the typed kernel; no cartesian anywhere in the rewrite") {
    val p = plan("q97_cut_repeated_spans")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"expected the JVM tokenize/rebuild kernels:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q80 sources its edges from the LSH chain — no block-cell self-join, no cartesian") {
    val p = plan("q80_leakage_safe_split")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the O(n^2) blocked exact-pairs source replicates rows into __cell_*
    // block cells; the scale path must not — its candidate join is on LSH
    // band signatures
    assert(!p.contains("__cell_"), s"q80 must not use the blocked all-pairs source:\n$p")
  }

  it("q113 probes the STANDING IVF index; the snapshot diff joins (id, hash) projections only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val qe = SparkEntry.queries("q113_incremental_reembed")(spark, dir).queryExecution
    assert(qe.executedPlan.toString.contains("InMemoryTableScan"),
      s"expected the probe to read the memoized inverted-list assignment:\n${qe.executedPlan}")
    // pin the diff kernel separately (AQE hides subtrees from collect): the
    // changed-slice full-outer join must co-shuffle (id, 8-byte hash) pairs,
    // never the embedding payloads
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = SparkEntry.tbl(spark, dir, "embeddings")
      val slice = operators.Snapshot.changedSlice(
        emb, emb.limit(10), "vec_id", "embedding")
      val shuffles = slice.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, slice.queryExecution.executedPlan.toString)
      val leaked = shuffles.flatMap(_.output.map(_.name)).filter(_ == "embedding")
      assert(leaked.isEmpty,
        s"payload column crossed the diff shuffle:\n${slice.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // The per-key stats operators join O(keys)-cardinality frames (medians,
  // winsorize cuts, quantile cut tables) back to the rows. That join must
  // NOT be a mandatory broadcast: on a per-user key at 100x scale the stats
  // frame is data-proportional and a forced hint OOMs the driver. Proof: with
  // broadcasting disabled entirely, the plan must degrade to a shuffle join —
  // a broadcast() hint would still plan BroadcastExchange at threshold -1.
  it("robustStats/winsorize/bucketByQuantile/q108 have NO mandatory broadcast (shuffle-join under threshold -1)") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      for (q <- Seq("q98_robust_stats", "q92_winsorize", "q90_quantile_buckets", "q108_outlier_events")) {
        val p = plan(q)
        assert(!p.contains("BroadcastExchange"),
          s"$q still plans a broadcast with the threshold disabled — a forced hint survives:\n$p")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  it("q122 bigram counts pair tokens NARROW (no self-join/window before the count shuffle)") {
    val p = plan("q122_bigram_lm")
    assert(!p.contains("Window"), s"bigram pairing must not window over tokens:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"scan must prune to text only:\n$p")
    // the only exchanges are the two count aggs + the ctx join — token rows
    // themselves never shuffle (Generate sits below the partial aggregate)
    assert(p.contains("Generate explode"), p)
  }

  it("q123 nucleus coverage windows the (lang, source) COUNT frame, not corpus rows") {
    val p = plan("q123_nucleus_sources")
    // the Window's child must be the aggregated count frame: exactly one
    // pre-window hash aggregate pair over the pruned 2-column scan
    assert(p.contains("ReadSchema: struct<lang:string,source:string>"),
      s"scan must prune to (lang, source):\n$p")
    assert(p.contains("Window"), p)
    val genIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", genIdx) >= 0,
      s"window must sit above the count aggregate:\n$p")
  }

  it("q125 semantic dedup blocks by centroid cell: equi-join on cent_id, no cartesian") {
    import org.apache.spark.sql.functions.col
    // the final q125 plan reads cached/checkpointed frames, so pin the pair
    // SOURCE at the operator (as the exactSimilarPairs test does): the
    // within-cell compare must plan a hash-family equi-join on cent_id
    val emb = SparkEntry.tbl(spark, dir, "embeddings")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
    val idx = operators.Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCentroids = 16)
    val pp = operators.Similarity.centroidBlockedPairs(idx, 0.999)
      .queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"),
      s"within-cell compare must equi-join on cent_id:\n$pp")
    assert(pp.contains("Join"), pp)
    // full-query plan: the only non-equi joins are the 1-row scalar
    // assembly crossJoins (q84/q119 convention)
    val p = plan("q125_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q126 minhash merge: one aggregation pass computes all three signatures; text never re-reads") {
    val p = plan("q126_minhash_merge")
    // three conditional mins in ONE HashAggregate keyed (source, seed) — a
    // per-batch re-scan would show three separate scans of documents
    assert("FileScan parquet".r.findAllIn(p).size === 1,
      s"signature build must scan documents ONCE:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q127 fk audit: every edge is an anti-join (counts only), no cartesian anywhere") {
    val p = plan("q127_fk_audit")
    assert(!p.contains("CartesianProduct"), p)
    // LEFT ANTI appears per fact->dim edge
    assert("LeftAnti".r.findAllIn(p).size === 5, s"expected 5 anti-join edges:\n$p")
  }

  it("q129 rare-bigram probe joins the BROADCAST common set (the Zipf head), never shuffling doc bigrams for the lookup") {
    val p = plan("q129_rare_bigram_rate")
    assert(p.contains("BroadcastHashJoin"),
      s"common-set lookup must broadcast (the vocabulary-bounded side):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"the (doc_id, w1, w2) frame must persist for its two consumers:\n$p")
  }

  it("q128 flagship EMA: one exchange (the groupSort layout), no window, no join") {
    val p = plan("q128_ema_reduce")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p)
  }

  it("q133 BM25 prunes the documents scan, broadcasts df/corpus stats, and top-ks without a global sort") {
    val p = plan("q133_bm25_topk")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // per-term df (|terms| rows) and the 1-row corpus stats ride broadcasts;
    // the only equi-joins key on term / doc id — never a cartesian
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // global top-10 is per-partition k + driver merge, not a full sort
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
  }

  it("q134 hybrid RRF fuses two bounded rank lists: no cartesian, broadcast query vector, top-k merge") {
    val p = plan("q134_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
  }

  it("q143 negative sampling: bounded candidate expansion, anti-join, no cartesian") {
    val p = plan("q143_negative_sampling")
    assert(!p.contains("CartesianProduct"),
      s"the probe x parts frame must broadcast-expand, not cartesian:\n$p")
    assert(p.contains("LeftAnti"), s"positives must be removed by an anti-join:\n$p")
  }

  it("q150 kappa reads the PERSISTED confusion frame in all three aggregation branches") {
    val p = plan("q150_kappa_agreement")
    try {
      // every branch reads the cache (the plan STRING also reprints the
      // cached subtree under each InMemoryTableScan, so FileScan text
      // appearing per branch is display, not re-execution)
      assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
        s"expected all three margin branches to read the cached confusion frame:\n$p")
    } finally SparkEntry.drainCleanups()
  }

  // q50's FINAL plan reads from the checkpointed component iteration, so the
  // pair source must be pinned at the operator (q50 consumes it pre-checkpoint)
  it("exactSimilarPairs (q26/q50's pair source) is an equi-join on the block-cell key") {
    val emb = SparkEntry.tbl(spark, dir, "embeddings")
    val p = operators.Similarity.exactSimilarPairs(emb, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"all-pairs must block, not cross-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs must block, not nested-loop:\n$p")
    assert(p.contains("Join"), s"expected a (hash/sort-merge) equi-join node:\n$p")
  }

  it("q152 PageRank's final plan reads the CHECKPOINTED rank (lineage truncated per round)") {
    val p = plan("q152_pagerank")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the last iteration's localCheckpoint to truncate lineage:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q153 phrase search reads the CHECKPOINTED postings; joins are equi, never cartesian") {
    val p = plan("q153_phrase_search")
    // the corpus tokenizes ONCE into the postings checkpoint; both start
    // frames then read the materialized RDD (no second parquet scan)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"), s"start frames must not re-scan the corpus:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the aligned-position phrase join must be an equi-join:\n$p")
  }

  it("q155 triangle census: wedge and closure joins are equi-joins, never cartesian") {
    val p = plan("q155_triangle_census")
    assert(!p.contains("CartesianProduct"),
      s"degree-oriented wedge expansion must stay an equi-join:\n$p")
    // the only nested-loop node is the final 1-row census crossJoin
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("LeftSemi"), s"triangle closure must be a semi-join:\n$p")
  }

  it("q156 label propagation reads the CHECKPOINTED final round") {
    val p = plan("q156_label_propagation")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the last round's localCheckpoint to truncate lineage:\n$p")
  }

  it("q166 query-table BM25: ONE corpus scan (persisted postings), broadcast query table, no per-term columns") {
    val p = plan("q166_bm25_query_table")
    // the (doc, term) postings frame is persisted and every consumer (the
    // scoring spine plus the broadcast dl/df/corpus builds) reads the
    // cache — each InMemoryTableScan node echoes the one-scan cached plan
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"expected dl/df/scoring to all read the persisted postings:\n$p")
    // the query table and per-term stats ride broadcasts; scoring joins are
    // hash equi-joins, never a cartesian and never a per-term projection
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("__tf0"), s"per-term column explosion leaked in:\n$p")
  }

  it("SWEEP: every Window in EVERY query plan sits above a bounded frame, never a raw corpus scan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // The scary window shape at 100 TB is the UNPARTITIONED Window over an
    // unbounded input: it funnels the whole frame into ONE task (the
    // "No Partition Defined" warning). Two shapes are fine and used here:
    // a PARTITIONED window over raw data scales exactly like groupBy (one
    // shuffle on the partition keys — q68's per-user rolling stats), and
    // an unpartitioned window over a BOUNDED frame ranks an aggregate's
    // result (q133's global BM25 rank over a top-k). This sweep pins the
    // discipline structurally: every unpartitioned Window's input must be
    // bounded — every leaf path below it passes an aggregate / limit /
    // top-k / per-key group limit before reaching a scan (literal
    // LocalTableScan and Range leaves are driver-bounded by construction;
    // joins of bounded sides stay bounded — products of aggregate
    // cardinalities, never corpus mass).
    val bounding = Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate",
      "TakeOrderedAndProject", "CollectLimit", "GlobalLimit", "LocalLimit",
      "WindowGroupLimit")
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other
    }
    def boundedBelow(p0: SparkPlan): Boolean = {
      val p = unwrap(p0)
      val name = p.nodeName
      if (bounding.exists(name.contains)) true
      else p match {
        case i: InMemoryTableScanExec => boundedBelow(i.relation.cachedPlan)
        case leaf if leaf.children.isEmpty =>
          name.contains("LocalTableScan") || name.contains("EmptyRelation") ||
            name.contains("Range")
        case other => other.children.nonEmpty && other.children.forall(boundedBelow)
      }
    }
    // A PARTITIONED window is equally lethal when every partition key is a
    // KNOWN-SKEWED low-cardinality column (lang, source, status bands...):
    // the dominant class lands in ONE window partition = one task buffering
    // a corpus-scale slice, and AQE can split a skewed JOIN partition but
    // never a skewed WINDOW partition (the Privacy.kAnonymize lesson).
    // Such windows must also sit above a bounded frame. Keys are matched by
    // attribute name with derived-alias prefixes stripped.
    val skewedCols = Set("lang", "source", "status", "event_type", "len_b",
      "l_returnflag", "l_linestatus", "o_orderstatus", "o_orderpriority",
      "c_mktsegment", "r_name", "n_name", "level")
    def skewedOnlyKeys(w: org.apache.spark.sql.execution.window.WindowExec): Boolean =
      w.partitionSpec.nonEmpty && w.partitionSpec.forall(
        _.references.forall(a => skewedCols.contains(a.name.stripPrefix("__g_"))))
    def windows(p0: SparkPlan): Seq[org.apache.spark.sql.execution.window.WindowExec] = {
      val p = unwrap(p0)
      val self = p match {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty || skewedOnlyKeys(w) => Seq(w)
        case _ => Nil
      }
      val viaCache = p match {
        case i: InMemoryTableScanExec => windows(i.relation.cachedPlan)
        case _ => Nil
      }
      self ++ viaCache ++ p.children.flatMap(windows)
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        finally SparkEntry.drainCleanups()
      windows(plan).filterNot(w => w.children.forall(boundedBelow))
        .map(w => s"$name plans a Window over an unbounded input:\n$w")
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
    // the checker itself must CATCH a deliberately unbounded window — a
    // sweep that can't fail is not a gate
    import org.apache.spark.sql.functions.{col, row_number}
    val broken = SparkEntry.tbl(spark, dir, "documents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
      .queryExecution.executedPlan
    assert(windows(broken).exists(w => !w.children.forall(boundedBelow)),
      s"the sweep failed to flag a Window over a raw corpus scan:\n$broken")
    // ... and a PARTITIONED window whose keys are all known-skewed columns
    val brokenSkew = SparkEntry.tbl(spark, dir, "documents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))))
      .queryExecution.executedPlan
    assert(windows(brokenSkew).exists(w => !w.children.forall(boundedBelow)),
      s"the sweep failed to flag a skew-partitioned Window over a raw scan:\n$brokenSkew")
  }

  it("q218 main-content extraction rides the scan: zero exchanges, two-column read") {
    val p = plan("q218_main_content")
    assert(!p.contains("Exchange"), s"block extraction must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  it("q219 probes the STANDING two-level index (cached assignment, no rebuild in the plan)") {
    val p = plan("q219_ann_two_level")
    assert(p.contains("InMemoryTableScan"),
      s"expected the probe to read the persisted hierarchical assignment:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q204 fans out through REUSED exchanges (the measured no-persist decision can't silently regress)") {
    // q204's cleaned frame (the lineDedup chain) feeds THREE consumers —
    // LM training, scoring, and the release join — and is deliberately NOT
    // persisted: ReuseExchange computes the chain once for all consumers
    // (persist was MEASURED 2x slower at sf0.1). That reuse is a plan
    // property, invisible to the no-Window pin below: a refactor that
    // perturbs one consumer's subtree (a different column order, an extra
    // projection below the exchange) would silently ~3x the heaviest bench
    // row. Pin the ReusedExchange count in the non-adaptive tree (AQE
    // reuses at runtime, same subtrees — the static tree is the stable
    // observable).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q204_release_pipeline")
      val reused = "ReusedExchange".r.findAllIn(p).size
      assert(reused >= 4,
        s"q204 expected >=4 ReusedExchange nodes (got $reused) — the cleaned " +
          s"fan-out is recomputing per consumer:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  it("q200/q204 kAnonymize subtree plans NO Window at all (groupBy class sizes + skew-splittable join back)") {
    Seq("q200_k_anonymity", "q204_release_pipeline").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q: class sizes must be groupBy+join, never a window partitioned by skewed quasi columns:\n$p")
    }
  }

  it("q170 ranked top-k BM25: bounded-heap combiner over the standing postings, NO Window over the scored frame") {
    val p = plan("q170_bm25_topk_queries")
    // scoring reads the persisted standing postings (the q166 shape) ...
    assert(p.contains("InMemoryTableScan"),
      s"expected the scorer to read the persisted standing postings:\n$p")
    // ... and the per-query rank is the map-side-combining bounded heap,
    // never a Window sort of all scored (query, doc) pairs
    assert(!p.contains("Window"),
      s"top-k per query must use the bounded-heap combiner, not a Window:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  it("q176 span attribution: broadcast eval windows, anti-joined df cap, no cartesian") {
    val p = plan("q176_span_attribution")
    // the eval-side window frame is small by contract and must broadcast
    // into the match join; the df cap is a build-side anti-join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), s"expected the hot-window df-cap anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
  }

  it("q174/q175 PQ search: standing code frame from the store cache, no cartesian, no Window") {
    Seq("q174_pq_ann", "q175_ivfpq_ann").foreach { q =>
      val p = plan(q)
      // the ADC scan reads the persisted standing code frame, not a rebuild
      assert(p.contains("InMemoryTableScan"),
        s"$q: expected the persisted standing PQ codes:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("Window"),
        s"$q: ranking must be the bounded-heap combiner, not a Window:\n$p")
    }
  }

  it("q154 importance selection broadcasts the bounded bucket tables, never the corpus") {
    val p = plan("q154_importance_selection")
    // both the 1-row totals and the enriched-bucket list ride broadcasts;
    // the per-doc gram stream must NOT appear under a BroadcastExchange
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(!read.contains("source") && !read.contains("n_chars"),
      s"scan reads unused columns: $read\n$p")
  }
}
