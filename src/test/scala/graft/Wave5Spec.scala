package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-10 queries (d89–d92). The oracle gate pins the
  * exact values; these pin the semantic guarantees that hold at any scale
  * factor — the properties a 100 TB run relies on.
  */
class Wave5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d2q kernel equals the imperative integer squared distance on random vectors") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(16)(rnd.nextLong() % 10000000L),
      Seq.fill(16)(rnd.nextLong() % 10000000L)))
    val got = rows.toDF("x", "c")
      .select(queries.DataQueries10.d2q(col("x"), col("c")).as("d2"))
      .collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((x, c), d) =>
      val expect = x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d == expect, s"x=$x c=$c")
    }
  }

  test("d89 k-means: every round partitions the corpus; inertia never increases") {
    val rows = q("d89_kmeans_train").collect()
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    val byRound = rows.groupBy(_.getAs[Long]("round"))
    assert(byRound.keySet == (1L to queries.DataQueries10.KmRounds).toSet)
    // assignment is total: per-round cluster sizes sum to the corpus
    byRound.values.foreach(rs => assert(rs.map(_.getAs[Long]("n")).sum == n))
    // Lloyd monotonicity: total inertia is non-increasing round over round
    val inertia = byRound.toSeq.sortBy(_._1)
      .map(_._2.map(_.getAs[Long]("inertia")).sum)
    assert(inertia.zip(inertia.tail).forall { case (a, b) => b <= a })
  }

  test("d90 KL: self-distribution term structure — corpus-identical source sits near zero") {
    val rows = q("d90_source_kl").collect()
    assert(rows.nonEmpty)
    // Gibbs: KL >= 0 up to the per-word floor-quantization bias, which is
    // bounded by 1 q9-unit per (source, word) type
    rows.foreach { r =>
      assert(r.getAs[Long]("kl_q9") >= -r.getAs[Long]("n_types"))
    }
  }

  test("d91 scaling curve: all counters are monotone in the prefix size k") {
    val rows = q("d91_dedup_scaling").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 3)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("n_docs") >= a.getAs[Long]("n_docs"))
      assert(b.getAs[Long]("exact_dups") >= a.getAs[Long]("exact_dups"))
      assert(b.getAs[Long]("near_pairs") >= a.getAs[Long]("near_pairs"))
      assert(b.getAs[Long]("distinct_texts") >= a.getAs[Long]("distinct_texts"))
    }
  }

  test("d93 pagerank: isolated docs carry exactly the teleport mass; total mass is sub-stochastic") {
    val rows = q("d93_pagerank").collect()
    val n = rows.length.toLong
    val teleport = (150000000L.toDouble / n).floor.toLong
    rows.filter(_.getAs[Long]("deg") == 0L)
      .foreach(r => assert(r.getAs[Long]("pr_q9") == teleport))
    // floors only ever drop mass (plus the dangling leak): sum <= 1e9
    assert(rows.map(_.getAs[Long]("pr_q9")).sum <= 1000000000L)
    // connected docs accumulate at least the teleport floor
    rows.foreach(r => assert(r.getAs[Long]("pr_q9") >= teleport))
  }

  test("d94 IVF-PQ: recall bounded by k; nn1_rank consistent with recall") {
    val rows = q("d94_ivfpq_search").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (k, hits, nn1) =
        (r.getAs[Long]("k"), r.getAs[Long]("hits_pq"), r.getAs[Long]("nn1_rank"))
      assert(k == 3 && hits >= 0 && hits <= k && nn1 >= 1)
      // the true NN inside the ADC top-3 implies at least one recall hit
      if (nn1 <= 3) assert(hits >= 1)
    }
  }

  test("d95 rerank: recall is monotone in the shortlist depth") {
    // a true-top-3 member can only be displaced from a larger shortlist's
    // exact top-3 by vectors strictly closer — which are themselves true
    // top-3 members, so the hit count never decreases with depth
    val rows = q("d95_adc_rerank").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (k, a, h8, h32) = (r.getAs[Long]("k"), r.getAs[Long]("hits_adc"),
        r.getAs[Long]("hits_r8"), r.getAs[Long]("hits_r32"))
      assert(a <= h8 && h8 <= h32 && h32 <= k, s"non-monotone recall: $r")
    }
  }

  test("d96 KS drift: D is a probability-scaled statistic with consistent complements") {
    val rows = q("d96_ks_drift").collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_s") + rows.head.getAs[Long]("n_rest")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_s") + r.getAs[Long]("n_rest") == n)
      val ks = r.getAs[Long]("ks_q6")
      assert(ks >= 0 && ks <= 1000000L)
    }
  }

  test("d97 LSH audit: flagged counts bounded by pair counts; every candidate pair is audited") {
    val rows = q("d97_lsh_miss_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_pairs")))
    // the candidate set is a subset of the probe set, so total flagged
    // equals the candidate-pair count exactly (restricted to docs with
    // shingles — all candidates have >= 3 words by construction)
    val cand = graft.operators.TextDedup.minhashCandidates(
      graft.sources.Tables.load(spark, dir, "documents"), "doc_id", "text").count()
    assert(rows.map(_.getAs[Long]("n_flagged")).sum == cand)
  }

  test("d98 corpus card: one row, internally consistent") {
    val r = q("d98_corpus_card").collect() match { case Array(x) => x }
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    assert(r.getAs[Long]("exact_dup_docs") >= 0)
    assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
    assert(r.getAs[Long]("keep_rate_q6") >= 0 && r.getAs[Long]("keep_rate_q6") <= 1000000L)
    // mean and median must both lie inside the observed length range
    val mean = r.getAs[Long]("mean_len_q6") / 1000000.0
    assert(math.abs(mean - r.getAs[Long]("n_tokens").toDouble / nDocs) < 1)
    assert(r.getAs[Long]("median_len") > 0)
  }

  test("d99 shard balance: imbalance >= even-split floor and finer sharding uses more shards") {
    val rows = q("d99_shard_balance").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      // max load * n_shards >= total => imbalance >= ~1e6 (floor may shave 1)
      assert(r.getAs[Long]("imbalance_q6") >= 999999L, r.toString)
      assert(r.getAs[Long]("used") <= r.getAs[Long]("n_shards"))
    }
    val hashRows = rows.filter(_.getAs[String]("scheme").startsWith("hash"))
      .sortBy(_.getAs[Long]("n_shards"))
    // coarser sharding has more tokens per shard
    val maxLoads = hashRows.map(_.getAs[Long]("max_load"))
    assert(maxLoads.zip(maxLoads.tail).forall { case (a, b) => b <= a })
  }

  test("q43 funnel: stage user counts never increase down the funnel") {
    val rows = q("q43_funnel").collect().sortBy(_.getAs[String]("stage"))
    assert(rows.length == 3)
    val users = rows.map(_.getAs[Long]("users"))
    assert(users.zip(users.tail).forall { case (a, b) => b <= a }, users.mkString(","))
    rows.foreach(r => assert(r.getAs[Long]("conv_q6") <= 1000000L))
  }

  test("m05 media near-dup: containment bounded, pairs ordered, shared >= 2") {
    val rows = q("m05_media_neardup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("shared") >= 2)
      assert(r.getAs[Long]("overlap_q6") <= 1000000L)
    }
  }

  test("d100 dup-quality: the two groups partition the corpus") {
    val rows = q("d100_dup_quality").collect()
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    assert(rows.map(_.getAs[String]("status")).toSet == Set("clustered", "singleton"))
  }

  test("d92 histogram quantiles: upper-edge estimates never undershoot; estimates are monotone in p") {
    val rows = q("d92_hist_quantiles").collect().sortBy(_.getAs[Long]("p"))
    assert(rows.length == 4)
    // the sketch reports a bin's UPPER edge, so est >= exact always
    rows.foreach(r => assert(r.getAs[Long]("err") >= 0,
      s"p=${r.getAs[Long]("p")} est undershot exact"))
    // and the error is bounded by the bin width
    rows.foreach(r => assert(r.getAs[Long]("err") <= 16))
    val est = rows.map(_.getAs[Long]("est"))
    assert(est.zip(est.tail).forall { case (a, b) => b >= a })
  }
}
