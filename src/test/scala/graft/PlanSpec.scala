package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the plans, not just the answers, are the
  * product at 100 TB. Each assertion pins a property that a refactor could
  * silently regress (pushdown reaching the scan, broadcasts on dims, partial
  * aggregation, no accidental cartesian products).
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("driver contract: entry produces rows (the driver smoke-checks rows>0)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries plan without cartesian products") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product:\n$p")
    }
  }

  test("every unpartitioned window runs over a reviewed bounded table") {
    // a Window with an EMPTY partitionSpec moves its entire input into ONE
    // task — fatal if the input is corpus-sized at 100 TB. The design rule
    // (ScaleWindows): global windows are legal only over tables bounded by
    // a value domain or a fixed k, never by data volume. This sweep pins
    // the reviewed whitelist so a corpus-global window can never slip into
    // a new query unnoticed.
    // audited 2026-08-15 (optimizedPlan Window nodes, child inspected):
    val reviewed: Set[String] = Set(
      // top-k tables under a GlobalLimit (50/200/1000 rows)
      "d102_rrf_hybrid", "d106_weighted_sample", "d109_zipf_slope",
      "d74_vocab_coverage",
      // per-shard aggregates — row count = the fixed shard count
      "d113_pack_order", "d151_pack_xdoc", "d42_seq_pack", "d43_pack_greedy",
      "d44_pack_report", "d47_pack_capped", "d85_pack_capstone",
      "d88_seqlen_curve", "m04_mm_pack", "d141_shard_admission",
      // per-source/domain stat tables (|sources| rows; d139/d53 are the
      // one-row whole-table stat broadcast written as an empty-order window)
      "d107_apportion", "d108_waterfill", "d143_epoch_plan",
      // d192: apportion's remainder-rank window over the noised-bin table
      // (|sensitive bands| rows — value-domain bounded, the d107 shape)
      "d192_dp_consistent",
      // q54/q56: the cumulative walk over the QSketch bucket table
      // (bounded by the value DOMAIN at <= ~1.9k rows — ~3.8k signed —
      // for any corpus: the d92 histogram-read shape)
      "q54_qsketch_read", "q56_qsketch_signed",
      "d139_doremi_reweight", "d53_temp_mix",
      // value-domain-bounded rollups: distinct lengths / bins / bands
      "d171_cap_solver", "d26_length_band", "d34_prep_pipeline",
      "d92_hist_quantiles", "d98_corpus_card",
      // doubly-contracted ScaleWindows band tables (bounded by Long-domain
      // arithmetic, the r15 design) and the fixed rule/stage orders
      "d154_classifier_auc", "d155_score_spearman", "d177_auc_binned",
      "d160_filter_waterfall", "d165_dedup_funnel",
      // (r22: d137_bpe_ids left this set — its vocab rank window now runs
      // at plan-build time behind the vocabularyMap collect, so the final
      // plan is window-free; the window itself is unchanged and still
      // vocab-bounded inside BpeTokenizer.vocabulary)
      // ANSI-surface distribution functions over a FIXED-predicate input
      // (c_custkey < 500 caps the window at 499 rows at any SF); the
      // scale-path siblings are q44's closed-form + ScaleWindows ranks
      "q24_dist")
    val offenders = SparkEntry.queries.keys.flatMap { name =>
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val globals = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      graft.sources.Caches.release(spark)
      if (globals.nonEmpty) Some(name) else None
    }.toSeq.sorted
    assert(offenders.toSet == reviewed,
      s"unpartitioned-window queries changed: $offenders (reviewed: $reviewed)")
  }

  test("q01: filter pushed to parquet scan + two-phase aggregation") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial+final agg expected\n" + p)
  }

  test("q02: only the fixed-size nation dim is force-broadcast") {
    val p = plan("q02_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // with auto-broadcast off, any remaining BroadcastHashJoin is a forced
    // hint: exactly one is legitimate (nation, 25 rows fixed); customer is
    // SF-proportional (150k x SF) and must shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p2 = plan("q02_join_agg")
      assert("BroadcastHashJoin".r.findAllIn(p2).length == 1,
        "only nation may carry a broadcast hint\n" + p2)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q07: semi/anti joins stay semi/anti (no materialized distinct)") {
    val p = plan("q07_semi_anti")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("pipeline serialize: column pruning reaches the events scan") {
    val p = plan("p03_ser_json")
    assert(p.contains("ReadSchema"), p)
    // props is needed (k label) but text-heavy columns of other tables never
    // enter; the scan must not read more than events' own 6 columns
    assert(!p.toLowerCase.contains("batchevalpython"), p)
    assert(p.contains("static_invoke"), "custom expressions should bind via StaticInvoke\n" + p)
  }

  test("d03: shingle join is a hash join, heavy work not in join condition") {
    val p = plan("d03_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("array_intersect"), "intersections must come from aggregation, not set ops\n" + p)
  }

  test("d02: LSH candidate gen is a bucket-shuffle pair expansion, no join") {
    // the band-bucket phase must never be a (broadcast) self-join of the
    // corpus band table — docs sharing a bucket meet in a groupBy reducer
    // that emits the pairs directly (SURVEY §9's claimed shape)
    val p = plan("d02_minhash_lsh")
    assert(!p.contains("Join"), "no join of any kind in candidate generation\n" + p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("d03/d12/d17/d28: corpus-proportional join sides are never force-broadcast") {
    // with auto-broadcast off, any BroadcastHashJoin left in the static plan
    // can only come from a forced broadcast() hint — exactly the 100 TB
    // driver-OOM hazard these queries must not have (AQE may still choose a
    // broadcast at runtime when a side genuinely fits). d12's df table is
    // vocabulary-sized (corpus-derived); its one-row corpus count broadcasts
    // via BroadcastNestedLoopJoin, which this guard intentionally permits.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("d03_ngram_jaccard", "d12_tfidf", "d28_lm_score").foreach { n =>
        val p = plan(n)
        assert(!p.contains("BroadcastHashJoin"),
          s"$n: forced broadcast hint on a corpus-proportional side\n$p")
      }
      // d17's query binding composes from the memoized/persisted clusters
      // table, whose CACHED plan froze auto-broadcast choices made at
      // materialization time (runtime decisions, not hints) — so guard the
      // fresh API shape, which plans the whole pipeline under the -1
      // threshold
      val d17 = graft.operators.TextDedup
        .applyDedup(graft.sources.Tables.load(spark, dir, "documents"),
          "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(!d17.contains("BroadcastHashJoin"),
        s"d17 applyDedup: forced broadcast hint on a corpus-proportional side\n$d17")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d46: domain cap is a two-phase bounded aggregate, no per-group window sort") {
    val p = plan("d46_domain_cap")
    // TopKStruct partial + final (O(k) state per domain with map-side combine)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "partial+final TopKStruct aggregation expected\n" + p)
    // never a rank window over the corpus
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "domain capping must not window-sort the corpus\n" + p)
  }

  test("d35: simhash banding is a bucket shuffle, no join; signature is one kernel call") {
    val p = plan("d35_simhash_band")
    assert(!p.contains("Join"), "candidate generation must not join\n" + p)
    assert(p.contains("static_invoke"), "simhash must come from the codegen'd kernel\n" + p)
  }

  test("d37: cosine verify runs on candidate pairs via equi-joins, no forced broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("d37_srp_near_dup")
      // exactly one forced broadcast is legitimate: the fixed 16x64 SRP
      // plane table inside the signature computation; the corpus-sized
      // vector sides of the verify join must shuffle. (With auto-broadcast
      // off the 16x64 plane construction itself may plan as a cartesian of
      // two tiny ranges — fine; the global no-cartesian test covers the
      // default config.)
      assert("BroadcastHashJoin".r.findAllIn(p).length <= 1,
        "only the fixed plane table may broadcast\n" + p)
      assert(p.contains("SortMergeJoin"), "verify joins must shuffle\n" + p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d38/d39: filters are narrow maps — no shuffle before the output sort") {
    Seq("d38_repetition", "d39_quality_rules").foreach { n =>
      val p = plan(n)
      assert("Exchange".r.findAllIn(p).length <= 1, s"$n: only the final orderBy may exchange\n$p")
    }
  }

  test("d41: cross-shard dedup is semi/anti joins behind a bloom pre-filter, no forced broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("d41_cross_shard_dedup")
      assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
      assert(!p.contains("BroadcastHashJoin"),
        "reference-shard sides are corpus-proportional — never force-broadcast\n" + p)
      // the bloom summaries gate the dump side BEFORE the semi-joins (only
      // probable hits shuffle); the blooms themselves are fixed-size and
      // broadcast via BNLJ — the one legitimate broadcast here
      assert(p.contains("might_contain"), "bloom pre-filter missing from the plan\n" + p)
      assert(p.contains("bloom_filter_agg") || p.contains("BloomFilterAggregate"),
        "reference bloom must be built in-plan\n" + p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d34: exact-dedup stage is the groupBy shape, not a corpus window") {
    val p = plan("d34_prep_pipeline")
    assert(!p.contains("windowspecdefinition(h#"),
      "dedup must be groupBy(h).agg(min) + semi-join, not min over a window on md5(text)\n" + p)
    assert(p.contains("LeftSemi"), p)
  }

  test("d09: simhash is a narrow map — no shuffle before the output sort") {
    val p = plan("d09_simhash")
    assert("Exchange".r.findAllIn(p).length <= 1, "only the final orderBy may exchange\n" + p)
    assert(p.contains("static_invoke"), "kernel should bind via StaticInvoke\n" + p)
  }

  test("d13: deterministic sample keeps scan column-pruned") {
    val p = plan("d13_sample")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"), p)
  }

  test("q19: correlated scalar subquery decorrelates to an aggregate join") {
    val p = plan("q19_corr_subquery")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("d23: benchmark gram set broadcasts; grams join as kernel hashes") {
    val p = plan("d23_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("static_invoke") && p.contains("shingleG"),
      "grams must come from the codegen'd shingle kernel, not string columns\n" + p)
  }

  test("d24: SRP plane table broadcasts; signature agg is two-phase") {
    val p = plan("d24_srp_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial sum") ||
      "HashAggregate".r.findAllIn(p).length >= 2, "map-side partials expected\n" + p)
  }

  test("d30: mixing rate table broadcasts; no corpus-side shuffle before filter") {
    val p = plan("d30_mix")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d22/d27/d31: narrow maps — no shuffle before the output sort") {
    Seq("d22_redact", "d27_quantize", "d31_zorder").foreach { n =>
      val p = plan(n)
      assert("Exchange".r.findAllIn(p).length <= 1, s"$n: only the final orderBy may exchange\n$p")
    }
  }

  test("d42/d43: packing is per-shard windows/folds; greedy joins nothing") {
    // greedy: ONE fold pass — the global-id prefix-sum windows the folded
    // shards-row frame before the explode, so no join and no second pass
    val p43 = plan("d43_pack_greedy")
    assert(!p43.contains("Join"), "greedy packing must not join\n" + p43)
    // chunked: the only join is the shards-row base table broadcast back
    val p42 = plan("d42_seq_pack")
    assert("BroadcastHashJoin".r.findAllIn(p42).length <= 1,
      "only the shards-row base table may broadcast-join\n" + p42)
  }

  test("d52: BM25 is narrow scoring around one-row broadcasts, top-k never sorts the corpus") {
    val p = plan("d52_bm25")
    // the final top-20 is a bounded TakeOrderedAndProject (O(k) per
    // partition), never a global Sort of scored documents
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), "BM25 must not global-sort the corpus\n" + p)
    // corpus stats (N, avgdl, df) reach the scorer as ONE broadcast row
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("d54: repeated-gram audit joins co-partitioned hashes, no forced broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("d54_repeated_grams")
      // the gram-frequency side is corpus-sized: it must shuffle-join on
      // the gram hash, never carry a broadcast hint (AQE may still choose
      // to broadcast at small SF — that is a runtime decision, not a hint)
      assert(!p.contains("BroadcastHashJoin"),
        "repeated-gram df side must not be hint-broadcast\n" + p)
      // grams cross the shuffle as the codegen'd 60-bit hash kernel
      assert(p.contains("static_invoke"), "grams must be kernel hashes\n" + p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d56: semantic dedup candidates come from the cell equijoin, never a broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("d56_semdedup")
      // cells are corpus-sized: the x/y candidate join and the dropped-id
      // anti side must shuffle-join, never carry a broadcast hint (the only
      // allowed broadcast is ivfAssign's bounded centroid table)
      assert("BroadcastHashJoin".r.findAllIn(p).isEmpty,
        "semantic-dedup joins must not be hint-broadcast\n" + p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d57: DSIR weights join co-partitioned hashes around a one-row broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("d57_dsir_weights")
      // tokens cross the shuffle as the codegen'd 60-bit hash kernel
      assert(p.contains("static_invoke"), "tokens must be kernel hashes\n" + p)
      // the vocab-stats side is corpus-vocab-sized: no broadcast hint on it;
      // the ONLY hinted broadcast is the one-row totals crossJoin
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1, p)
      assert("BroadcastHashJoin".r.findAllIn(p).isEmpty,
        "vocab-stats join must not be hint-broadcast\n" + p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d59/d60/d61: mask stats, entropy and sketch audit join NOTHING") {
    // all three are pure aggregation shapes over one scan — any Join node
    // appearing here is a regression (the mask decision is a stateless
    // hash, the entropy terms pre-quantize, the sketch rides the same agg)
    for (q <- Seq("d59_span_mask", "d60_entropy", "d61_gram_sketch")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not join:\n$p")
    }
    // entropy words cross the shuffle as codegen'd kernel hashes
    assert(plan("d60_entropy").contains("static_invoke"), plan("d60_entropy"))
  }

  test("d64/d67: span-coverage and boilerplate grams cross shuffles as kernel hashes") {
    // the (doc, gram) traffic is the corpus-sized flow in both queries; it
    // must ride the codegen'd 60-bit md5-prefix kernel (8-byte longs), not
    // string gram columns
    for (q <- Seq("d64_dup_spans", "d67_boilerplate")) {
      val p = plan(q)
      assert(p.contains("static_invoke"), s"$q grams must be kernel hashes:\n$p")
    }
    // d67's global top-20 must be a TakeOrdered (20 rows per partition move),
    // never a corpus-wide Sort + Limit
    val p67 = plan("d67_boilerplate")
    assert(p67.contains("TakeOrderedAndProject"), p67)
    assert("HashAggregate".r.findAllIn(p67).length >= 2, "partial+final agg expected\n" + p67)
  }

  test("d68: only the one-row totals aggregate crosses as a nested-loop broadcast") {
    // the cached IVF assignment legitimately carries its own Inner BNLJ
    // (bounded centroid broadcast); d68 itself may add exactly ONE Cross —
    // the one-row totals aggregate
    val p = plan("d68_ivf_balance")
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).length == 1, p)
  }

  test("d69/d72: winnowing grams are kernel hashes; no corpus-sized broadcast") {
    for (q <- Seq("d69_winnowing", "d72_winnow_overlap")) {
      val p = plan(q)
      // the corpus-sized flow (gram positions x window fan-out) must ride
      // the codegen'd 60-bit kernel, and nothing corpus-sized may broadcast
      assert(p.contains("static_invoke"), s"$q grams must be kernel hashes:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("d70/d71: tokenizer-stat top-20s move 20 rows per partition, aggs are two-phase") {
    for (q <- Seq("d70_bpe_pairs", "d71_colloc_dice")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q must TakeOrdered:\n$p")
      assert("HashAggregate".r.findAllIn(p).length >= 2,
        s"$q partial+final agg expected:\n$p")
    }
  }

  test("d73: power-iteration matvec joins nothing, sums in two phases") {
    val p = plan("d73_power_iter")
    assert(!p.contains("Join"), s"matvec must be a narrow map + rollup:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "partial+final agg expected\n" + p)
  }

  test("d74: vocabulary rank runs over a bounded TakeOrdered, not the full vocab") {
    // distinct tokens grow with the corpus (Heaps' law): the global rank
    // window must consume the top-1000 TakeOrdered (20 rows per partition
    // move), never sort the whole vocabulary through one task
    val p = plan("d74_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), s"top-1000 prune expected:\n$p")
    val win = p.indexOf("Window")
    val tak = p.indexOf("TakeOrderedAndProject")
    assert(win >= 0 && win < tak,
      s"the rank Window must sit ABOVE the TakeOrdered prune (parent prints first):\n$p")
  }

  test("d77: line dedup is rollups + hash joins — no window, no broadcast of the corpus") {
    val p = plan("d77_line_dedup")
    assert(!p.contains("Window"), s"keeper election must be a min-struct rollup, not a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"partial+final agg expected:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d78: PQ sub-codebook broadcasts; scoring never shuffles the corpus side twice") {
    val p = plan("d78_pq_codes")
    assert(p.contains("BroadcastHashJoin"), s"8x4 sub-codebook must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("d79: hashed classifier scoring joins nothing — one narrow projection") {
    val p = plan("d79_hash_classifier")
    assert(!p.contains("Join"), s"score must be a per-doc array fold, no join:\n$p")
    assert(!p.contains("HashAggregate"), s"no shuffle-side aggregation expected:\n$p")
  }

  test("d93: PageRank rounds are equi-joins + two-phase rollups — corpus never broadcast-nested") {
    val p = plan("d93_pagerank")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // three message rounds => at least three partial/final aggregate pairs
    assert("HashAggregate".r.findAllIn(p).length >= 6,
      s"expected two-phase aggregation per round:\n$p")
  }

  test("d94: ADC lookups join the broadcast distance table; only the 8-row probe set nested-loops") {
    val p = plan("d94_ivfpq_search")
    // forced bounded broadcasts: sub-codebook, distance table, probe set
    assert(p.contains("BroadcastHashJoin"), s"distance table must broadcast:\n$p")
    // every nested-loop join must be the exact-ground-truth comparison
    // against the BROADCAST 8-row probe set (the subtree appears once per
    // consumer); the corpus side must never be the build side
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(l => l.contains("BuildRight") && l.contains("NOT (vec_id")),
      s"unexpected nested-loop join:\n${bnlj.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d101: the prefix-rank window is partitioned by document (never a global sort)") {
    val p = plan("d101_prefix_filter")
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(__id"),
      "the rank window must exchange on the doc id, not a single partition\n" + p)
  }

  test("d155: rank windows partition by score; no corpus-sized single-partition sort") {
    val p = plan("d155_score_spearman")
    // the tiebreak row_number windows must exchange on the score hash —
    // the r13 verdict's scale-killer was two corpus-sized global sorts here
    assert(p.contains("hashpartitioning(sa"),
      "the sa rank window must partition by score\n" + p)
    assert(p.contains("hashpartitioning(sb"),
      "the sb rank window must partition by score\n" + p)
    // the within-band cumulative windows partition by band; only the
    // bounded band-total table sees a global window, and it joins back
    // as a broadcast
    assert(p.contains("hashpartitioning(__band"),
      "the within-band cumulative window must partition by band\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the bounded band-below table must broadcast\n" + p)
    // the only unpartitioned windows are the cumulative counts over the
    // POST-AGGREGATE distinct-score tables (the d154/q20 bounded shape):
    // every row_number window must carry a partition spec
    val rn = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty && rn.forall(l =>
      l.contains("windowspecdefinition(sa#") || l.contains("windowspecdefinition(sb#")),
      "row_number must be score-partitioned\n" + rn.mkString("\n"))
  }

  test("d177: both AUCs share one score rollup; rank windows are banded/partitioned") {
    val p = plan("d177_auc_binned")
    // the exact side's below-count must route through the banded shape
    // (within-band window partitioned by band), not a global cumulation
    assert(p.contains("hashpartitioning(__band"),
      "exact-side below-count must be band-partitioned\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d178: midrank histograms join plainly (no forced broadcast of corpus-sized tables)") {
    val p = plan("d178_spearman_tied")
    assert(p.contains("hashpartitioning(__band"),
      "midrank below-counts must be band-partitioned\n" + p)
    // row_number must not appear at all — midranks come from arithmetic,
    // not per-row window ranking
    assert(!p.contains("row_number"),
      "tie-averaged Spearman must not rank rows\n" + p)
  }

  test("d58: exact terciles come from banded rank arithmetic, not a per-language sort") {
    val p = plan("d58_ppl_buckets")
    assert(!p.contains("ntile"),
      "ntile window must be gone — the per-lang sort put ~corpus/|langs| in one task\n" + p)
    assert(p.contains("hashpartitioning(lang") && p.contains("__band"),
      "below-counts must be banded per language\n" + p)
    // the only row_number is the doc_id tiebreak partitioned by the
    // near-unique (lang, score) key
    val rn = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("windowspecdefinition(lang#")),
      "tiebreak must partition by (lang, score)\n" + rn.mkString("\n"))
  }

  test("d106/d109: bounded top-k is a TakeOrdered, not a global sort+limit") {
    assert(plan("d106_weighted_sample").contains("TakeOrderedAndProject"),
      "A-ES top-k must be a bounded TakeOrdered")
    assert(plan("d109_zipf_slope").contains("TakeOrderedAndProject"),
      "the vocab prune must be a bounded TakeOrdered (the d74 rule)")
  }

  test("d112: the ablation matrix plans with no join and no row fan-out") {
    val p = plan("d112_rule_ablation")
    assert(!p.contains("Join"), "one narrow conditional aggregation expected\n" + p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial+final agg\n" + p)
  }

  test("d03/d118: the 2..16 df valve gates the pair expansion (SURVEY §9)") {
    // the boilerplate-shingle skew valve must be IN the plan, before the
    // collect_list, so no reducer ever materializes an unbounded id list
    for (q <- Seq("d03_ngram_jaccard", "d118_thresh_curve")) {
      val p = plan(q)
      assert(p.contains("__df"), s"$q: df valve predicate missing from plan\n$p")
      assert("__df#\\d+L? >= 2".r.findFirstIn(p).isDefined &&
        "__df#\\d+L? <= 16".r.findFirstIn(p).isDefined,
        s"$q: 2..16 window not found\n$p")
    }
  }

  test("d138: KN marginal joins run AFTER the bounded top-20 prune, as broadcasts") {
    val p = plan("d138_kneser_ney")
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      "the top-20 must be a bounded TakeOrdered before any marginal join\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "post-prune marginal joins must broadcast the 20-row side\n" + p)
  }

  test("d157: gap window partitions by term and the per-term rollup reuses its exchange") {
    val p = plan("d157_postings_cost")
    assert(p.contains("windowspecdefinition(term"),
      "the delta-gap window must partition by term (a global sort would be the bug)\n" + p)
    // the groupBy(term) after the window must NOT introduce a second
    // term exchange: the window's hashpartitioning(term) satisfies it
    val termEx = "Exchange hashpartitioning\\(term".r.findAllIn(p).length
    assert(termEx == 1, s"expected exactly one term exchange, found $termEx\n$p")
  }

  test("d159: the 16-row probe filter reaches the parquet scan; planes broadcast") {
    val p = plan("d159_jl_distortion")
    assert(p.contains("LessThan(vec_id,16"),
      "probe predicate must be pushed to the scan\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the 8x64 plane table must broadcast\n" + p)
  }

  test("d167: self-rank comes from a broadcast compare, never a candidate-set window") {
    val p = plan("d167_retrieval_eval")
    assert(!p.contains("windowspecdefinition"),
      "self-rank must be a broadcast-join count, not a rank window over candidates\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the 16-row probe/self sides must broadcast\n" + p)
  }

  test("d164/d165: the shared IVF/cluster memos are reused from cache") {
    assert(plan("d164_centroid_refresh").contains("InMemoryTableScan"),
      "d164 must read the persisted IVF assignment, not recompute it")
    assert(plan("d165_dedup_funnel").contains("InMemoryTableScan"),
      "d165 must read the persisted dedup clusters, not recompute them")
  }

  test("d170: trained weight table broadcasts; corpus scoring join stays partitioned") {
    val p = plan("d170_linear_probe")
    assert(p.contains("BroadcastExchange"),
      "the 64-row NB weight table and one-row prior must broadcast\n" + p)
    assert(p.contains("SortMergeJoin"),
      "the doc-id scoring join must remain a partitioned join (never a corpus broadcast)\n" + p)
  }

  test("d175: the overlap matrix is one join-free pass over the corpus") {
    val p = plan("d175_rule_overlap")
    assert(!p.contains("Join"),
      "ten kill/intersection counts must come from a single conditional aggregation\n" + p)
  }

  test("d142: median/MAD windows are partitioned by source over the bounded length table") {
    val p = plan("d142_mad_outliers")
    assert(p.contains("windowspecdefinition(source"),
      "rank-arithmetic windows must partition by source (never one global sort)\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "the distinct-length table must be the persisted multi-consumer input\n" + p)
  }

  test("d144: every shuffle is doc-keyed — nothing ever crosses documents") {
    val p = plan("d144_intradoc_runs")
    val exchanges = "Exchange hashpartitioning\\(([^,]+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("doc_id")),
      s"non-doc-keyed exchange found: $exchanges\n$p")
  }

  test("d145: wordpiece encode is one narrow kernel projection over the scan") {
    val p = plan("d145_wordpiece")
    assert(p.contains("static_invoke(graft.functions.PromCatalyst.wordpiece"),
      "encode must be the codegen'd kernel call\n" + p)
    assert(!p.contains("Join"), "the encode plan must be join-free\n" + p)
    assert(!p.contains("Exchange hashpartitioning"),
      "the encode plan must not shuffle (output sort excepted)\n" + p)
  }

  test("d150: candidate pairs are the cell equijoin with top-k pushed below the shuffle") {
    val p = plan("d150_label_noise")
    assert(p.contains("WindowGroupLimit"),
      "the rank<=3 filter must push a partial top-k below the exchange\n" + p)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell".r.findFirstIn(p).isDefined,
      "neighbor candidates must join on the IVF cell key\n" + p)
  }

  test("q13: exact median is rank arithmetic — no unmergeable Percentile buffer") {
    val p = plan("q13_sketches")
    assert(!p.contains("percentile(") && !p.contains("Percentile"),
      "exact Percentile aggregate must not appear; q20 rank shape expected\n" + p)
    assert(p.contains("hashpartitioning(l_returnflag") && p.contains("__band"),
      "banded rank-arithmetic median expected (ScaleWindows.rankTable)\n" + p)
    assert(!p.contains("row_number"),
      "no rank window may remain — the flag-partitioned sort put ~corpus/3 in one task\n" + p)
  }

  test("q20/q41/q44: no window partitioned by a constant-domain key over corpus rows") {
    // the r14 verdict's last scale-killer family: a window partitioned by
    // the 3-value l_returnflag sorts ~corpus/3 in ONE task (AQE cannot
    // split a window partition). Exact order statistics must come from
    // rank arithmetic over the (group, distinct value) count table, with
    // every window banded (ScaleWindows.rankTable).
    for (name <- Seq("q20_median", "q41_quartiles")) {
      val p = plan(name)
      assert(!p.contains("row_number"), s"$name must not rank rows\n$p")
      assert(p.contains("__band"), s"$name below-counts must be banded\n$p")
      // windows may partition by (flag, band) over the count table, or by
      // flag over the bounded band table — never by the bare flag ordering
      // directly on the raw price (the old corpus-per-task sort spec)
      assert("windowspecdefinition\\(l_returnflag#\\d+, p#".r.findFirstIn(p).isEmpty,
        s"$name must not window-partition raw prices by the 3-value flag\n$p")
    }
    // q44's distribution functions are closed-form in the group count: the
    // whole plan is aggregate + explode — no Window operator at all
    val p44 = plan("q44_ntile_dist")
    assert(!p44.contains("Window"), s"q44 must not contain any window\n$p44")
    assert("HashAggregate".r.findAllIn(p44).length >= 2,
      "q44's only corpus pass must be a partial-aggregatable count\n" + p44)
  }

  test("m11: pair candidates come from a dhash equijoin over the cached decode") {
    // the near-dup join must be priced on valved hash buckets: an equijoin
    // keyed by the codec-derived dhash (never media x media), reading the
    // decoded hash table from ONE materialization — four consumers
    // re-decoding every GIF per branch would quadruple the codec cost
    val p = plan("m11_video_neardup")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\\n]*dhash".r
      .findFirstIn(p).nonEmpty, s"pair join must key on dhash\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"decoded hash table must be cached, not re-decoded per consumer\n$p")
    graft.sources.Caches.release(spark)
    // m12: candidates from the (band, value) equijoin; Hamming verification
    // is a codegen'd xor+popcount projection, never a second decode
    val p12 = plan("m12_video_hamming")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\\n]*bnd".r
      .findFirstIn(p12).nonEmpty, s"m12 candidates must key on (bnd, bv)\n$p12")
    assert(p12.contains("bit_count"), s"m12 must verify via popcount\n$p12")
    graft.sources.Caches.release(spark)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // at 100 TB a selective dim predicate should gate the fact scan at row
    // level before the shuffle — Spark's runtime bloom filter does exactly
    // that once enabled; pin that the lever engages on our data
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val o = graft.sources.Tables.load(spark, dir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(li("l_returnflag")).count()
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        "runtime bloom filter not injected:\n" + p)
    } finally {
      Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
    }
  }

  test("AQE splits a skewed join partition at runtime (the q14 lever's sibling)") {
    // salting (q14) fixes skew the plan can predict; AQE skew-join fixes
    // the skew discovered at RUNTIME from shuffle statistics — the lever a
    // 100 TB run leans on when a hot key emerges mid-job. Pin that it
    // engages: a join where half the left side lands on one key must
    // finalize with SortMergeJoin(skew=true) reading a split
    // (AQEShuffleRead skewed) partition. Thresholds are scaled down to the
    // test's data volume; production uses the 256MB defaults.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val left = spark.range(0, 400000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      assert(j.collect().length == 201000) // finalize the adaptive plan
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
      assert(p.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("d180-d183/q47: privacy aggs and count-min keep the corpus un-reshuffled") {
    // d181: the four per-level class-size tables join back by BROADCAST —
    // the corpus side never pays a join shuffle (the alternative, four
    // count-over-partition windows, would re-shuffle the corpus per level)
    val p181 = plan("d181_kanon_generalize")
    assert("BroadcastHashJoin".r.findAllIn(p181).length == 3,
      "all three consulted class-size joins must broadcast\n" + p181)
    assert(!p181.contains("SortMergeJoin"), "no corpus-side join shuffle\n" + p181)
    // d183: same ladder against a reference corpus — still all-broadcast
    val p183 = plan("d183_kanon_reference")
    assert("BroadcastHashJoin".r.findAllIn(p183).length == 3 &&
      !p183.contains("SortMergeJoin"), "reference sizes must broadcast\n" + p183)
    // d180/d182: a single hash aggregation each, no joins at all
    Seq("d180_kanon_audit", "d182_ldiversity").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Join"), s"$n must be join-free\n$p")
    }
    // q47: the 128-row sketch broadcasts into the estimate join; the only
    // non-broadcast join keys on user_id (exact vs estimate, both already
    // key-partitioned aggregates)
    val p47 = plan("q47_count_min")
    assert(p47.contains("BroadcastHashJoin"), "sketch must broadcast\n" + p47)
    // d184: two corpus aggregations, then everything joins on CELL tables
    // (|classes x values| rows) — class sizes, the per-value histogram,
    // and the one-row total all broadcast; no SortMergeJoin anywhere
    val p184 = plan("d184_tcloseness")
    assert("BroadcastHashJoin".r.findAllIn(p184).length >= 2 &&
      p184.contains("BroadcastNestedLoopJoin") &&
      !p184.contains("SortMergeJoin"),
      "t-closeness joins must all broadcast\n" + p184)
    // d186: the cross-dump variant keeps the identical all-broadcast
    // posture (reference histogram + class sizes + one-row total)
    val p186 = plan("d186_tcloseness_ref")
    assert("BroadcastHashJoin".r.findAllIn(p186).length >= 2 &&
      p186.contains("BroadcastNestedLoopJoin") &&
      !p186.contains("SortMergeJoin"),
      "reference t-closeness joins must all broadcast\n" + p186)
    // d185: same posture plus the ONE window — partitioned by class over
    // the dense |classes| x m grid (a bounded-table shuffle, never the
    // corpus), with the grid cross and cell join broadcast
    val p185 = plan("d185_tcloseness_emd")
    assert("BroadcastHashJoin".r.findAllIn(p185).length >= 1 &&
      !p185.contains("SortMergeJoin"),
      "ordinal t-closeness joins must all broadcast\n" + p185)
    assert("Window".r.findAllIn(p185).length >= 1 &&
      p185.contains("windowspecdefinition"),
      "the grid cumsum runs as one partitioned window\n" + p185)
    // d187: the cross-dump EMD keeps the d185 shape — union value grid,
    // all-broadcast joins, one partitioned window, no SortMergeJoin
    val p187 = plan("d187_tcloseness_emd_ref")
    assert("BroadcastHashJoin".r.findAllIn(p187).length >= 1 &&
      !p187.contains("SortMergeJoin") &&
      p187.contains("windowspecdefinition"),
      "cross-dump EMD must stay all-broadcast with one window\n" + p187)
  }

  test("d188/d190: DP noise is a join-free narrow map; exact runs semi-join before widening") {
    // d188: one corpus aggregation, then the inverse-CDF CASE chain as a
    // narrow projection — no join, no second shuffle beyond the groupBy
    // (+ the orderBy's range exchange); the release noise costs nothing at
    // 100 TB beyond the aggregation the release already pays
    val p188 = plan("d188_dp_noise")
    assert(!p188.contains("Join"), "noise must not join\n" + p188)
    // r21: the inverse-CDF lookup is the array-literal bracket
    // (element_at(zs, size(filter(his, u >= h)) + 1) — the Hll.biasOf
    // discipline), not a 125-347-arm when-chain; the physical simple-mode
    // text folds the projection into the aggregate's output, so pin the
    // expression on the optimized logical plan
    val l188 = SparkEntry.queries("d188_dp_noise")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(l188.contains("element_at") && l188.contains("filter("),
      "the inverse-CDF array-bracket lookup must be in-plan\n" + l188)
    assert(!(l188.contains("CASE WHEN") && l188.contains("__u24")),
      "the noise lookup must not regress to the when-chain form\n" + l188)
    // d190: the gram tables shrink to the FLAGGED docs via broadcast
    // semi-joins BEFORE the (doc, gram) match join widens anything
    val p190 = plan("d190_exact_runs")
    assert(p190.contains("LeftSemi"), "gram tables must semi-join to flagged docs\n" + p190)
    assert(!p190.contains("CartesianProduct"), p190)
    // d191: the ladder inherits d181's all-broadcast posture and the noise
    // stays a narrow map on top. Assert the INVARIANT (class joins exist
    // and are all broadcast; no sort-merge, no cartesian) rather than an
    // exact join count — a benign ladder refactor that adds or merges a
    // broadcast join is not a posture regression (ADVICE r19)
    val p191 = plan("d191_dp_pipeline")
    assert("BroadcastHashJoin".r.findAllIn(p191).length >= 1 &&
      !p191.contains("SortMergeJoin") && !p191.contains("CartesianProduct") &&
      !p191.contains("ShuffledHashJoin"),
      "the released ladder must keep the broadcast class joins\n" + p191)
  }

  test("d193/d194/q53/q54: clip windows on the user key; sketches stay join-free and broadcast-audited") {
    // d193: the clip is ONE window PARTITIONED by the user key (the
    // shuffle any per-user aggregation pays — never an unpartitioned
    // corpus window), and the noise stays a join-free narrow CASE map
    val p193 = plan("d193_dp_user_level")
    assert(p193.contains("windowspecdefinition(user_id"),
      "the clip must window on the user key\n" + p193)
    assert(!p193.contains("Join"), "the user-level release must not join\n" + p193)
    // the rank-limit pushdown is load-bearing at 100 TB: the row_number
    // <= c filter must plan as a WindowGroupLimit BEFORE the user-key
    // exchange (map-side top-c per user — shuffle volume is bounded by
    // c rows per user per input partition, not the corpus). Two nodes:
    // the partial pre-shuffle pass and the final post-shuffle one.
    assert("WindowGroupLimit".r.findAllIn(p193).length >= 2,
      "the clip's rank limit must push map-side\n" + p193)
    // d194: one corpus aggregation, then bounded-table rollups — no join
    val p194 = plan("d194_dp_parallel")
    assert(!p194.contains("Join"), "the parallel ledger must not join\n" + p194)
    // q53: the sketch state is ONE hash aggregation (map-side partials
    // into <= ~1.9k buckets) — no join, no window, no corpus sort
    val p53 = plan("q53_qsketch_state")
    assert(p53.contains("HashAggregate") && !p53.contains("Join") &&
      !p53.contains("windowspecdefinition"),
      "the sketch state must be one hash aggregation\n" + p53)
    // q54: the containment audit joins the corpus ONCE against the
    // broadcast 5-row quantile table (BroadcastNestedLoopJoin on the
    // bounded side) — no SortMergeJoin, no corpus sort; the only window
    // is the cumulative walk over the bounded bucket table
    val p54 = plan("q54_qsketch_read")
    assert(p54.contains("BroadcastNestedLoopJoin") &&
      !p54.contains("SortMergeJoin") && !p54.contains("CartesianProduct"),
      "the audit must broadcast the bounded quantile table\n" + p54)
  }
}
