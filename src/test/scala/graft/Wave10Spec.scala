package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-13 fourth wave (d163/d164/m07) plus the
  * mergeable streaming drift-sum twin: exact short-circuit cost
  * accounting, anchor-cosine sanity, energy conservation, and
  * batch/stream state equality.
  */
class Wave10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d163 exact cascade costs: best <= deployed, both within [n, 4n], and deployed matches the waterfall") {
    val r = q("d163_cascade_order").collect().head
    val (n, dep, best) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("deployed_cost"), r.getAs[Long]("best_cost"))
    assert(best <= dep, "the optimum can never cost more than the deployed order")
    assert(dep >= n && dep <= 4 * n, s"cost out of [n, 4n]: $r")
    assert(best >= n, "every doc evaluates at least one rule")
    val sv = r.getAs[Long]("saving_q6")
    assert(sv >= 0 && sv < 1000000L)
    // deployed cost re-derivable from the d160 funnel: docs reaching rule
    // k = n - killed by rules < k  =>  cost = n + Σ_{k=2..4} (n - cum_{k-1})
    val wf = q("d160_filter_waterfall").orderBy("rule_order").collect()
    val cum = wf.map(_.getAs[Long]("cum_killed"))
    val expected = n + (n - cum(0)) + (n - cum(1)) + (n - cum(2))
    assert(dep == expected,
      s"deployed cost $dep != funnel-derived $expected")
  }

  test("d164 refresh audit: cells partition the corpus and cosines are valid") {
    val rows = q("d164_centroid_refresh").orderBy("cell").collect()
    assert(rows.length == 4)
    val nv = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nv,
      "every vector must belong to exactly one cell")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_members"))
      val ca = r.getAs[Long]("cos_anchor_all_q6")
      assert(ca >= -1000000L && ca <= 1000000L, s"cos out of range: $r")
      // the anchor is a member of its own cell and every member chose this
      // anchor as its NEAREST centroid: the sum vector must align with it
      assert(ca > 0, s"anchor must positively align with its own cell: $r")
      if (!r.isNullAt(r.fieldIndex("cos_anchor_new_q6"))) {
        val cn = r.getAs[Long]("cos_anchor_new_q6")
        assert(cn >= -1000000L && cn <= 1000000L, s"cos out of range: $r")
      }
    }
  }

  test("m07 energy accounting: shard rollups conserve totals and drift straddles 1e6") {
    val rows = q("m07_mm_drift").orderBy("shard").collect()
    assert(rows.length == 4)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    assert(rows.map(_.getAs[Long]("n_items")).sum == docs.count())
    val totBytes = docs.agg(sum(length(col("text")))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("bytes")).sum == totBytes,
      "stub codec must see every byte exactly once")
    val drifts = rows.map(_.getAs[Long]("drift_q6"))
    // mean-of-ratios brackets the global mean: at least one shard at or
    // below 1e6 and one at or above (they average to ~1 by construction)
    assert(drifts.min <= 1000000L && drifts.max >= 1000000L,
      s"drift ratios must straddle 1e6: ${drifts.mkString(",")}")
    drifts.foreach(d => assert(d > 500000L && d < 2000000L,
      s"ASCII byte energies can't drift 2x across hash shards: $d"))
  }

  test("d165 dedup funnel partitions the corpus and stages are ordered") {
    val rows = q("d165_dedup_funnel").orderBy("stage_order").collect()
    assert(rows.length == 4)
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n,
      "every doc is attributed to exactly one stage (or kept)")
    val keep = rows.last
    assert(keep.getAs[String]("stage") == "keep")
    assert(keep.getAs[Long]("survivors") == keep.getAs[Long]("n_docs"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_removed") <= b.getAs[Long]("cum_removed"))
    }
    // near-dups exist at sf0.001 (the d15 candidate graph has ~45 nodes),
    // so the cascade must remove SOMETHING even when exact dups are absent
    assert(rows.take(3).map(_.getAs[Long]("n_docs")).sum > 0,
      "the dedup cascade must remove at least one doc on this fixture")
  }

  test("d166 yield accounting is monotone: each stage only removes tokens") {
    val rows = q("d166_token_yield").collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    rows.foreach { r =>
      val (raw, f, d2, t) = (r.getAs[Long]("raw_tokens"), r.getAs[Long]("after_filter"),
        r.getAs[Long]("after_dedup"), r.getAs[Long]("after_trunc"))
      assert(f <= raw && d2 <= f && t <= d2, s"stage tokens must be non-increasing: $r")
      val y = r.getAs[Long]("yield_q6")
      assert(y >= 0 && y <= 1000000L, s"yield fraction in [0,1]: $r")
    }
  }

  test("d167 self-rank is well-defined: every probe is its own candidate") {
    val rows = q("d167_retrieval_eval").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val (rank, nc) = (r.getAs[Long]("self_rank"), r.getAs[Long]("n_cands"))
      assert(rank >= 1 && rank <= nc, s"self_rank must be a valid rank: $r")
      assert(r.getAs[Boolean]("hit") == (rank == 1L))
      // a doc's halves always share the corpus-common unigrams, so the
      // probe must score itself (self_score defined and > 0)
      assert(r.getAs[Long]("self_score") > 0, s"probe must be its own candidate: $r")
    }
  }

  test("d168 kappa contingency partitions the corpus and kappa is bounded") {
    val r = q("d168_kappa_agreement").collect().head
    val parts = Seq("n_both_keep", "n_rule_only", "n_clf_only", "n_both_drop")
      .map(r.getAs[Long])
    assert(parts.sum == r.getAs[Long]("n"))
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(r.getAs[Long]("n") == n)
    if (!r.isNullAt(r.fieldIndex("kappa_q6"))) {
      val k = r.getAs[Long]("kappa_q6")
      assert(k >= -1000000L && k <= 1000000L, s"kappa out of [-1,1]: $k")
    }
  }

  test("d169 purity classes partition each language's docs") {
    val rows = q("d169_lang_purity").collect()
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pure") + r.getAs[Long]("n_mixed") +
        r.getAs[Long]("n_nohit") == r.getAs[Long]("n_docs"),
        s"pure+mixed+nohit must partition: $r")
      if (!r.isNullAt(r.fieldIndex("mean_purity_q6"))) {
        val p = r.getAs[Long]("mean_purity_q6")
        // argmax/total is at least 1/|langs| and at most 1
        assert(p >= 250000L && p <= 1000000L, s"mean purity out of [0.25,1]: $r")
      }
    }
  }

  test("d170 trained probe beats the untrained hash baseline on its training labels") {
    val r = q("d170_linear_probe").collect().head
    val n = r.getAs[Long]("n_docs")
    assert(n == graft.sources.Tables.load(spark, dir, "documents").count())
    val (pc, hc) = (r.getAs[Long]("n_probe_correct"), r.getAs[Long]("n_hash_correct"))
    assert(pc <= n && hc <= n)
    assert(r.getAs[Long]("acc_probe_q6") == pc * 1000000L / n)
    // the class-conditional contrast is FIT to these labels; the hash
    // weights are label-blind. The probe must not lose to it, and must
    // clear the majority-class floor any linear fit reaches.
    assert(pc >= hc, s"trained probe ($pc) lost to untrained hash ($hc)")
    assert(r.getAs[Long]("acc_probe_q6") >= 500000L,
      "fitted linear probe must beat a coin flip on its own training set")
  }

  test("d171 cap solver: chosen cap fills but never exceeds the budget") {
    val r = q("d171_cap_solver").collect().head
    val (raw, b, cap, tot, clipped) = (r.getAs[Long]("raw_tokens"),
      r.getAs[Long]("budget"), r.getAs[Long]("cap"),
      r.getAs[Long]("total_at_cap"), r.getAs[Long]("docs_clipped"))
    assert(b == 8 * raw / 10)
    assert(tot <= b, s"post-truncation total must fit the budget: $r")
    assert(cap >= r.getAs[Long]("base_cap"))
    // maximality: one more token of cap would add n_above tokens; the
    // refinement must leave less than one per-clipped-doc token of slack
    if (clipped > 0) assert(b - tot < clipped,
      s"cap+1 would still fit — solver left budget on the table: $r")
    // recompute the truncated total directly and compare exactly
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val direct = docs.select(least(size(split(col("text"), " ")).cast("long"), lit(cap)).as("t"))
      .agg(sum(col("t"))).collect().head.getLong(0)
    assert(direct == tot, s"closed-form total $tot != direct recompute $direct")
  }

  test("d172 matrix accounts for every candidate pair with valid rates") {
    val rows = q("d172_source_dup_matrix").collect()
    val totalPairs = q("d02_minhash_lsh").count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "every candidate pair lands in exactly one source cell")
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b"),
        "cells must be unordered-canonical")
      val rate = r.getAs[Long]("rate_q9")
      assert(rate >= 0 && rate <= 1000000000L, s"rate out of [0,1]: $r")
    }
  }

  test("d173 verified clustering never removes more than raw clustering") {
    val r = q("d173_overdeletion").collect().head
    val (nc, nv) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_verified"))
    assert(nv <= nc)
    val (rr, rv) = (r.getAs[Long]("removals_raw"), r.getAs[Long]("removals_verified"))
    assert(rv <= rr, "verified edges are a subset — components only shrink")
    assert(r.getAs[Long]("overdeletion") == rr - rv)
    // cross-query consistency: raw removals == d40's total removable docs
    val d40 = q("d40_dedup_report").collect()
    assert(d40.map(_.getAs[Long]("n_removable")).sum == rr,
      "d173's raw side must agree with the d40 savings report")
  }

  test("d174 transfer eval: accuracies valid, both domain halves populated") {
    val rows = q("d174_probe_transfer").collect()
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    val halves = rows.map(_.getAs[Boolean]("is_train_domain")).toSet
    assert(halves == Set(true, false), "the md5 source split must produce both halves")
    rows.foreach { r =>
      val acc = r.getAs[Long]("acc_q6")
      assert(acc >= 0 && acc <= 1000000L)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
    }
  }

  test("d175 overlap matrix is a valid Jaccard over the d163 kill sets") {
    val rows = q("d175_rule_overlap").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb), s"intersection bound violated: $r")
      if (!r.isNullAt(r.fieldIndex("jaccard_q6"))) {
        val j = r.getAs[Long]("jaccard_q6")
        assert(j >= 0 && j <= 1000000L)
        assert(j == both * 1000000L / (na + nb - both))
      }
    }
    // cross-query consistency: unconditional kill counts must agree with
    // the d163 contingency (same flags, same corpus)
    val d163n = q("d163_cascade_order").collect().head.getAs[Long]("n_docs")
    val wfN = q("d160_filter_waterfall").collect().map(_.getAs[Long]("n_docs")).sum
    assert(d163n == wfN)
  }

  test("streaming drift sums equal the batch sums (mergeable state across triggers)") {
    val s = spark
    import s.implicits._
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(32)
    val batch = graft.streaming.StreamOps
      .embedDriftSums(e, "vec_id", "embedding")
      .select(col("shard"), col("d"), col("sv").as("bsv"))
    val data = e.as[(Long, Array[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Array[Float])](spark)
    val out = graft.streaming.StreamOps
      .embedDriftSums(ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding")
    val query = out.writeStream.format("memory").queryName("drift_stream_out")
      .outputMode("complete").start()
    try {
      // two triggers — the state must MERGE, not overwrite
      ms.addData(data.take(16))
      query.processAllAvailable()
      ms.addData(data.drop(16))
      query.processAllAvailable()
      val streamed = spark.table("drift_stream_out")
      assert(streamed.count() == batch.count())
      assert(batch.join(streamed, Seq("shard", "d"))
        .filter(col("bsv") =!= col("sv")).count() == 0,
        "streamed per-dim sums must be batch-identical after both triggers")
    } finally query.stop()
  }
}
