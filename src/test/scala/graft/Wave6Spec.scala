package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-11 queries (d101–d115). The oracle gate pins
  * exact values at sf0.01; these pin the semantic guarantees that hold at
  * any scale factor — the properties a 100 TB run relies on.
  */
class Wave6Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d101 prefix filtering is exact-complete: equals brute-force J >= 0.8 pairs") {
    val s = spark
    import s.implicits._
    // crafted corpus: 0/1 near-identical (J ~ 0.9), 2 unrelated, 3/4 exact
    // duplicates, 5 shares a few grams with 0 but far below threshold
    val docs = Seq(
      (0L, "a b c d e f g h i j k l"),
      (1L, "a b c d e f g h i j k m"),
      (2L, "q r s t u v w x y z zz qq"),
      (3L, "m n o p m n o p m n o p"),
      (4L, "m n o p m n o p m n o p"),
      (5L, "a b c zz yy xx ww vv uu tt ss rr")).toDF("doc_id", "text")
    val got = operators.TextDedup
      .prefixFilterPairs(docs, "doc_id", "text", 3, 4, 5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute force over all pairs with the same shingle definition
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(i =>
      i -> grams(docs.filter(col("doc_id") === i).head().getString(1))).toMap
    val expect = (for {
      a <- all.keys; b <- all.keys if a < b
      in = (all(a) & all(b)).size; un = (all(a) | all(b)).size
      if in * 5 >= un * 4
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.contains((0L, 1L)) && expect.contains((3L, 4L)))
  }

  test("d101 prefix filtering: completeness on seeded random corpora with planted near-dups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (trial <- 1 to 3) {
      // random word-soup docs + planted one-word-substituted near-dups
      val base = (0 until 30).map { i =>
        (i.toLong, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val planted = (0 until 8).map { j =>
        val (_, t) = base(rnd.nextInt(base.size))
        val w = t.split(" ")
        w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
        (100L + j, w.mkString(" "))
      }
      val docs = (base ++ planted).toDF("doc_id", "text")
      val got = operators.TextDedup
        .prefixFilterPairs(docs, "doc_id", "text", 3, 4, 5)
        .select("a", "b").as[(Long, Long)].collect().toSet
      def grams(t: String) =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val all = (base ++ planted).map { case (i, t) => i -> grams(t) }.toMap
      val expect = (for {
        a <- all.keys; b <- all.keys
        if a < b && all(a).nonEmpty && all(b).nonEmpty
        in = (all(a) & all(b)).size; un = (all(a) | all(b)).size
        if in * 5 >= un * 4
      } yield (a, b)).toSet
      assert(got == expect, s"trial $trial: got ${got.size}, expected ${expect.size}")
    }
  }

  test("weightedSample: deterministic, bounded, rank consistent with key order") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).map(i => (i, i % 37 + 1)).toDF("id", "w")
    val a = operators.Sampling.weightedSample(df, "id", "w", 20).collect()
    val b = operators.Sampling.weightedSample(df, "id", "w", 20).collect()
    assert(a.toSeq == b.toSeq, "re-run must reproduce exactly")
    assert(a.length == 20)
    val keys = a.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("key_q9"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y })
    // all keys are <= 0 (ln u <= 0, w > 0)
    assert(keys.forall(_ <= 0L))
  }

  test("d103 silhouette: s bounded by construction, cells partition the corpus") {
    val rows = q("d103_silhouette").collect()
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    rows.foreach { r =>
      val m = r.getAs[Long]("mean_s_q6")
      assert(m >= 0L && m <= 1000000L,
        "b >= a for the argmin assignment, so s in [0, 1]")
    }
  }

  test("d104 band sweep: candidate volume is monotone in band count") {
    // every 2k-slot band is the union of two k-slot bands, so agreement at
    // fewer/wider bands implies agreement at more/narrower bands
    val rows = q("d104_band_sweep").collect().sortBy(_.getAs[Long]("bands"))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (lo, hi) => lo <= hi })
    val th = rows.map(_.getAs[Long]("thresh_q6"))
    assert(th.zip(th.tail).forall { case (hi, lo) => lo <= hi },
      "more bands -> lower S-curve threshold")
  }

  test("d105 graph stats: triangles bounded by wedges, degrees by nodes") {
    val r = q("d105_graph_stats").head()
    assert(r.getAs[Long]("n_triangles") * 3 <= math.max(r.getAs[Long]("n_wedges"), 1L))
    assert(r.getAs[Long]("max_degree") < math.max(r.getAs[Long]("n_nodes"), 1L))
    assert(r.getAs[Long]("cc_q6") >= 0L && r.getAs[Long]("cc_q6") <= 1000000L)
  }

  test("d107 apportionment sums exactly to the budget") {
    val rows = q("d107_apportion").collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L)
    rows.foreach(r =>
      assert((r.getAs[Long]("alloc") - r.getAs[Long]("base_alloc")).abs <= 1L))
  }

  test("d108 water-filling: feasible (alloc <= avail) and exhausts the budget") {
    val rows = q("d108_waterfill").collect()
    rows.foreach(r => assert(r.getAs[Long]("alloc") <= r.getAs[Long]("avail")))
    val t = rows.map(_.getAs[Long]("avail")).sum
    assert(rows.map(_.getAs[Long]("alloc")).sum == t * 19 / 20)
    // unsaturated sources are levelled within 1 token of each other
    val un = rows.filter(!_.getAs[Boolean]("saturated")).map(_.getAs[Long]("alloc"))
    if (un.nonEmpty) assert(un.max - un.min <= 1L)
  }

  test("d110 truncation curve: monotone in the cap") {
    val rows = q("d110_trunc_budget").collect().sortBy(_.getAs[Long]("cap"))
    val lost = rows.map(_.getAs[Long]("tokens_lost"))
    assert(lost.zip(lost.tail).forall { case (a, b) => b <= a })
    val kept = rows.map(_.getAs[Long]("tokens_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
  }

  test("d111: 60-bit gram hashing is collision-free on this corpus") {
    val r = q("d111_hash_collisions").head()
    assert(r.getAs[Long]("coll_60") == 0L,
      "the 'grams cross shuffles as longs' discipline rests on this")
    assert(r.getAs[Long]("n_h20") <= r.getAs[Long]("n_h60"))
  }

  test("d112 ablation: joint kills bounded by solo kills; diagonal is consistent") {
    val rows = q("d112_rule_ablation").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kill_both") <= r.getAs[Long]("kill_a"))
      if (r.getAs[String]("rule_a") == r.getAs[String]("rule_b"))
        assert(r.getAs[Long]("kill_both") == r.getAs[Long]("kill_a"))
    }
  }

  test("d113 packing: both orders respect the token-count lower bound") {
    val rows = q("d113_pack_order").collect()
    rows.foreach { r =>
      val lb = (r.getAs[Long]("tokens") + 255L) / 256L
      assert(r.getAs[Long]("nseq_arrival") >= lb)
      assert(r.getAs[Long]("nseq_sorted") >= lb)
    }
  }

  test("d115 bloom audit: no false negatives, fp rate within bound") {
    val r = q("d115_bloom_audit").head()
    assert(r.getAs[Boolean]("bloom_superset"))
    assert(r.getAs[Boolean]("fp_within_bound"))
    assert(r.getAs[Long]("exact_hits") <= r.getAs[Long]("n_probe"))
  }

  test("Allocation API: exact-sum and feasibility hold on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 5 + rnd.nextInt(20)
      val rows = (1 to n).map(i => (s"k$i", 1L + rnd.nextInt(10000).toLong))
      val df = rows.toDF("k", "w")
      val budget = 1L + rnd.nextInt(5000).toLong
      val ap = operators.Allocation.apportion(df, "k", "w", budget).collect()
      assert(ap.map(_.getAs[Long]("alloc")).sum == budget, s"trial $trial apportion")
      val total = rows.map(_._2).sum
      val wb = 1L + rnd.nextLong(total) // in [1, total)
      val wf = operators.Allocation.waterfill(df, "k", "w", wb).collect()
      assert(wf.map(_.getAs[Long]("alloc")).sum == wb, s"trial $trial waterfill sum")
      wf.foreach(r => assert(r.getAs[Long]("alloc") <= r.getAs[Long]("w")))
      val un = wf.filter(!_.getAs[Boolean]("saturated")).map(_.getAs[Long]("alloc"))
      if (un.nonEmpty) assert(un.max - un.min <= 1L, s"trial $trial level")
    }
    // 100 TB-magnitude inputs: budget * weight ~ 1e13 * 1e13 = 1e26 wraps
    // a Long product 10^7-fold — the DECIMAL(38,0) routing must keep the
    // exact-sum property (this case failed before that fix)
    val big = Seq(("a", 7_000_000_000_000L), ("b", 3_000_000_000_000L),
      ("c", 1_234_567_890_123L)).toDF("k", "w")
    val bigBudget = 5_000_000_000_000L
    val bp = operators.Allocation.apportion(big, "k", "w", bigBudget).collect()
    assert(bp.map(_.getAs[Long]("alloc")).sum == bigBudget, "decimal apportion")
    val bw = operators.Allocation.waterfill(big, "k", "w", bigBudget).collect()
    assert(bw.map(_.getAs[Long]("alloc")).sum == bigBudget, "decimal waterfill")
  }

  test("d116 MMR: step 1 is the relevance argmax; scores never exceed pure relevance") {
    val rows = q("d116_mmr_rerank").collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[Long]("step")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 4, "no re-selection")
    val first = rows.head
    assert(first.getAs[Long]("score_q6") == 7L * first.getAs[Long]("rel_q6"))
    rows.tail.foreach(r =>
      assert(r.getAs[Long]("score_q6") <= 7L * r.getAs[Long]("rel_q6"),
        "the redundancy penalty can only subtract"))
  }

  test("d117 cross-val: val docs are a strict minority and never feed the counts") {
    val rows = q("d117_crossval_lm").collect()
    val nVal = rows.map(_.getAs[Long]("n_val_docs")).sum
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(nVal > 0 && nVal * 10 < total, s"~1/20 split, got $nVal of $total")
  }

  test("d118 threshold curve is non-increasing in the cut") {
    val rows = q("d118_thresh_curve").collect().sortBy(_.getAs[Long]("t_pct"))
    val n = rows.map(_.getAs[Long]("n_pairs"))
    assert(n.zip(n.tail).forall { case (a, b) => b <= a })
  }

  test("d119 chunk dedup: identity n_dup = total - distinct; fractions bounded") {
    val r = q("d119_chunk_dedup").head()
    assert(r.getAs[Long]("n_dup") ==
      r.getAs[Long]("total_chunks") - r.getAs[Long]("n_distinct"))
    val f = r.getAs[Long]("dup_frac_q6")
    assert(f >= 0L && f <= 1000000L)
  }

  test("d120 confusion matrix: cells partition the corpus; shares bounded") {
    val rows = q("d120_langid_confusion").collect()
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.groupBy(_.getAs[String]("lang")).values.foreach { cells =>
      val s = cells.map(_.getAs[Long]("share_q6")).sum
      assert(s <= 1000000L && s > 1000000L - cells.length - 1,
        "floor shares of one row sum to 1e6 within |cells| units")
    }
  }

  test("d121 val coverage: seen bounded by types, coverage in [0, 1e6]") {
    q("d121_val_coverage").collect().foreach { r =>
      assert(r.getAs[Long]("n_seen") <= r.getAs[Long]("n_val_types"))
      val c = r.getAs[Long]("coverage_q6")
      assert(c >= 0L && c <= 1000000L)
    }
  }

  test("d122 dup-length profile: longer grams never touch more documents") {
    val rows = q("d122_dup_length_profile").collect().sortBy(_.getAs[Long]("gram_n"))
    // the PROVABLE monotone direction: every 5-sub-gram of a cross-doc
    // duplicated 8-gram occurs in the same >= 2 docs, so a doc touched at
    // gram length 8 is touched at 5 (and 5 at 3). dup_instances is NOT
    // strictly monotone under per-doc shingle dedup (two distinct
    // duplicated 8-grams can collapse onto one shared 5-gram), so it is
    // not asserted here — the sf0.01 oracle hash pins its exact values.
    val touched = rows.map(_.getAs[Long]("docs_touched"))
    assert(touched.zip(touched.tail).forall { case (a, b) => b <= a })
    rows.foreach(r =>
      assert(r.getAs[Long]("dup_instances") >= 2 * r.getAs[Long]("n_dup_grams")
        || r.getAs[Long]("n_dup_grams") == 0L))
  }

  test("d123 source quality: keep counts bounded, ratios in range") {
    q("d123_source_quality").collect().foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("keep_q6") <= 1000000L)
      assert(r.getAs[Long]("ttr_q6") <= 1000000L)
    }
  }

  test("d124 purity: cells partition the corpus; purity bounded below by 1/|labels|") {
    val rows = q("d124_cluster_purity").collect()
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("top_n") <= r.getAs[Long]("n"))
      val p = r.getAs[Long]("purity_q6")
      assert(p >= 1000000L / 10 - 1 && p <= 1000000L, "majority share >= 1/|labels|")
    }
  }

  test("d125 kNN accuracy: every query scored exactly once") {
    val r = q("d125_knn_accuracy").head()
    assert(r.getAs[Long]("n_queries") == 16L)
    assert(r.getAs[Long]("n_correct") <= 16L)
  }

  test("d126 decon: every held-out vector gets exactly one nearest train neighbor") {
    val rows = q("d126_semantic_decon").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("qid")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("cos_q6") <= 1000000L)
      assert(r.getAs[Boolean]("leaked") == (r.getAs[Long]("cos_q6") >= 900000L))
    }
  }

  test("d127 unique content: per-source hits bounded by type counts times docs") {
    val rows = q("d127_unique_vocab").collect()
    rows.foreach(r =>
      assert(r.getAs[Long]("unique_doc_hits") >= r.getAs[Long]("unique_types"),
        "each unique type has at least one doc hit"))
  }

  test("d131 locality: pair counts partition the candidate set") {
    val total = q("d02_minhash_lsh").count()
    assert(q("d131_dup_locality").collect().map(_.getAs[Long]("n_pairs")).sum == total)
  }

  test("d133 quantization recall: one row per probe, recall within [0, 3]") {
    val rows = q("d133_quant_recall").collect()
    assert(rows.map(_.getAs[Long]("qid")).toSet == (8L until 16L).toSet)
    rows.foreach { r =>
      val rec = r.getAs[Long]("recall3")
      assert(rec >= 0L && rec <= 3L)
    }
  }

  test("d130 label propagation: labels are node ids; isolated pairs settle to min id") {
    val s = spark
    import s.implicits._
    val rows = q("d130_label_prop").collect()
    val nodes = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(rows.forall(r => nodes.contains(r.getAs[Long]("community"))),
      "a community label is always some participating node's id")
    val edges = q("d02_minhash_lsh").select("a", "b").as[(Long, Long)].collect()
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
    val lab = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community")).toMap
    edges.filter(e => deg(e._1) == 1 && deg(e._2) == 1).foreach { case (a, b) =>
      assert(lab(a) == math.min(a, b) && lab(b) == math.min(a, b),
        s"self-vote LPA settles an isolated pair ($a,$b) to its min id")
    }
  }

  test("d128/d129: per-language ratios bounded") {
    q("d128_fertility").collect().foreach(r =>
      assert(r.getAs[Long]("fertility_q6") >= 1000000L,
        "BPE-ish segmentation never yields fewer tokens than whitespace"))
    q("d129_hapax").collect().foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("hapax_q6") <= 1000000L)
    }
  }
}
