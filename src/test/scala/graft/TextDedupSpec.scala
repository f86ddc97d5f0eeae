package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** The public table-agnostic dedup API on synthetic data (not the testdata
  * tables) — a reference user pointing the library at their own DataFrame.
  */
class TextDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 10
      (12L, "the quick brown fox jumps over the lazy cat tonight"), // near dup of 10
      (13L, "completely different words about spark engines and shuffles here"),
      (14L, "another unrelated sentence mentioning parquet files and columns")
    ).toDF("id", "text")
  }

  test("minhashCandidates finds the near-dup pair, not unrelated docs") {
    val cand = TextDedup.minhashCandidates(corpus, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((10L, 11L)), cand) // identical text, all bands agree
    // unrelated docs must not pair up with anything
    assert(!cand.exists { case (a, b) => a == 13L || b == 13L || a == 14L || b == 14L }, cand)
  }

  test("clusters assigns the min id as canonical; both CC paths agree") {
    val cand = TextDedup.minhashCandidates(corpus, "id", "text")
    val byProp = TextDedup.clusters(cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStar = TextDedup.clusters(cand, useAlternatingStar = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byProp == byStar, s"$byProp vs $byStar")
    assert(byProp(11L) == 10L)
    assert(byProp(10L) == 10L)
  }

  test("applyDedup keeps one representative per duplicate group") {
    val kept = TextDedup.applyDedup(corpus, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(10L) && !kept.contains(11L), kept) // exact dup dropped
    assert(kept.contains(13L) && kept.contains(14L), kept)  // uniques kept
  }

  test("applyDedup with precomputed clusters matches the self-computed result") {
    val cls = TextDedup.clusters(
      TextDedup.minhashCandidates(corpus, "id", "text")).persist()
    val viaSeam = TextDedup.applyDedup(corpus, "id", "text",
      precomputedClusters = Some(cls)).collect().map(_.getLong(0)).toSet
    val direct = TextDedup.applyDedup(corpus, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaSeam == direct, s"$viaSeam vs $direct")
    cls.unpersist(blocking = false)
  }

  test("maxBucket cap drops oversized buckets (the skew valve)") {
    val s = spark
    import s.implicits._
    // 6 identical docs: one bucket of size 6 per band -> capped at 5 = no pairs
    val many = (0L until 6L).map(i => (i, "same words in every single document here"))
      .toDF("id", "text")
    val capped = TextDedup.minhashCandidates(many, "id", "text", maxBucket = 5)
    assert(capped.isEmpty)
    val uncapped = TextDedup.minhashCandidates(many, "id", "text")
    assert(uncapped.count() == 15L) // 6 choose 2
  }

  test("dedupAgainst drops exact and near matches to the reference shard") {
    val s = spark
    import s.implicits._
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "reference only content with very specific wording here")
    ).toDF("id", "text")
    val fresh = Seq(
      (200L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 100
      (201L, "the quick brown fox jumps over the lazy cat tonight"), // near dup of 100
      (202L, "entirely new material mentioning shuffles and executors today")
    ).toDF("id", "text")
    val kept = TextDedup.dedupAgainst(fresh, ref, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(200L), kept) // exact cross-shard dup dropped
    assert(kept.contains(202L), kept)  // novel doc kept
    // bloom pre-filter is a pure superset filter: identical keeps for ANY
    // size (no false negatives; false positives just take the exact join)
    for (items <- Seq(16L, 1024L, 1000000L)) {
      val bloomed = TextDedup.dedupAgainst(fresh, ref, "id", "text", bloomItems = items)
        .collect().map(_.getLong(0)).toSet
      assert(bloomed == kept, s"bloomItems=$items changed the result: $bloomed vs $kept")
    }
    // the internal-API bridge functions are registered only for the
    // duration of plan analysis — nothing session-global remains
    val reg = spark.sessionState.functionRegistry
    Seq("graft_bloom_agg", "graft_might_contain").foreach { n =>
      assert(!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n leaked into the session registry")
    }
  }

  test("dedupAgainstStream (batch-callable) matches dedupAgainst decisions") {
    val s = spark
    import s.implicits._
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "shared reference sentence about spark engines and shuffles here")
    ).toDF("id", "text")
    val dump = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
      (11L, "the quick brown fox jumps over the lazy cat tonight"), // near dup
      (12L, "a genuinely new document mentioning parquet files and columns"),
      (13L, "xy") // fewer than 3 words: no shingles, must be kept
    ).toDF("id", "text")
    val batch = TextDedup.dedupAgainst(dump, reference, "id", "text")
      .collect().map(_.getLong(0)).toSet
    val twin = TextDedup.dedupAgainstStream(dump, reference, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(twin == batch, s"$twin vs $batch")
    assert(twin == Set(12L, 13L), twin)
  }

  test("parquet-persisted index reproduces dedupAgainst decisions exactly") {
    val s = spark
    import s.implicits._
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "shared reference sentence about spark engines and shuffles here")
    ).toDF("id", "text")
    val dump = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
      (11L, "the quick brown fox jumps over the lazy cat tonight"), // near dup
      (12L, "a genuinely new document mentioning parquet files and columns"),
      (13L, "xy") // fewer than 3 words: no shingles, must be kept
    ).toDF("id", "text")
    val direct = TextDedup.dedupAgainst(dump, reference, "id", "text")
      .collect().map(_.getLong(0)).toSet
    // the production incremental flow: index built once, saved, reloaded
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx")
      .resolve("idx").toString
    TextDedup.buildIndex(reference, "id", "text").write.parquet(dir)
    val idx = spark.read.parquet(dir)
    val viaIndex = TextDedup.dedupAgainstIndex(dump, idx, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaIndex == direct, s"$viaIndex vs $direct")
    val viaStream = TextDedup.dedupAgainstIndexStream(dump, idx, "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaStream == direct, s"$viaStream vs $direct")
    assert(direct == Set(12L, 13L), direct)
  }

  test("appendToIndex: incremental decisions match a from-scratch reference build") {
    val s = spark
    import s.implicits._
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("id", "text")
    val day1 = Seq(
      (10L, "a genuinely new document mentioning parquet files and columns"),
      (11L, "the quick brown fox jumps over the lazy dog tonight") // dup of ref
    ).toDF("id", "text")
    val day2 = Seq(
      (20L, "a genuinely new document mentioning parquet files and columns"), // dup of day1 survivor
      (21L, "the quick brown fox jumps over the lazy cat tonight"), // near dup of ref
      (22L, "entirely fresh words on streaming state stores and watermarks")
    ).toDF("id", "text")
    val idx1 = TextDedup.buildIndex(reference, "id", "text")
    val day1Kept = TextDedup.dedupAgainstIndex(day1, idx1, "id", "text")
    assert(day1Kept.collect().map(_.getLong(0)).toSet == Set(10L))
    // fold day 1's survivors in, dedup day 2 against the grown index...
    val idx2 = TextDedup.appendToIndex(idx1, day1Kept, "id", "text")
    val viaIncremental = TextDedup.dedupAgainstIndex(day2, idx2, "id", "text")
      .collect().map(_.getLong(0)).toSet
    // ...and the decisions must match dedup against (reference + admitted
    // docs) built from scratch
    val fromScratch = TextDedup.dedupAgainstIndex(day2,
        TextDedup.buildIndex(reference.unionAll(day1Kept.select("id", "text")),
          "id", "text"), "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaIncremental == fromScratch, s"$viaIncremental vs $fromScratch")
    assert(viaIncremental == Set(22L), viaIncremental)
  }

  test("winnow-kind index catches a contained excerpt the hash/band kinds miss") {
    val s = spark
    import s.implicits._
    val reference = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("id", "text")
    val dump = Seq(
      // 20 filler words hosting a verbatim 8-word excerpt of ref doc 1:
      // whole-doc md5 differs and overall Jaccard is far below the band
      // threshold, but the excerpt spans two disjoint 6-word runs -> two
      // shared winnowing fingerprints guaranteed
      (10L, "one two three four five six seven eight nine ten " +
        "alpha beta gamma delta epsilon zeta eta theta " +
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      (11L, "a genuinely new document mentioning parquet files and columns today")
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-widx")
      .resolve("idx").toString
    TextDedup.buildIndex(reference, "id", "text", winnowGramN = 3, winnowWindow = 4)
      .write.parquet(dir)
    val idx = spark.read.parquet(dir)
    // without the containment pass the excerpt host sails through...
    val without = TextDedup.dedupAgainstIndex(dump, idx, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(without == Set(10L, 11L), without)
    // ...the winnow kind drops exactly it
    val withWinnow = TextDedup.dedupAgainstIndex(dump, idx, "id", "text",
      winnowGramN = 3, winnowWindow = 4)
      .collect().map(_.getLong(0)).toSet
    assert(withWinnow == Set(11L), withWinnow)
    // decision equality with the direct (no-index) containment check: the
    // same distinct-fingerprint >= 2 rule computed straight from both
    // corpora agrees on every dump id
    val refFp = TextDedup.winnowFingerprints(reference, "id", "text", 3, 4)
      .select(col("g")).distinct()
    val directContained = TextDedup.winnowFingerprints(dump, "id", "text", 3, 4)
      .select(col("id"), col("g")).distinct()
      .join(refFp, Seq("g"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).collect().map(_.getLong(0)).toSet
    assert(directContained == Set(10L), directContained)
  }

  test("winnowAlignedRuns estimates the shared run, ignores unaligned noise") {
    val s = spark
    import s.implicits._
    // docs 20/21 share a verbatim 10-word run at DIFFERENT offsets (2 vs 5);
    // doc 22 shares nothing
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (20L, s"pre1 pre2 $run post1 post2 post3"),
      (21L, s"lead1 lead2 lead3 lead4 lead5 $run tail1"),
      (22L, "completely different words about engines and shuffles and columns here today")
    ).toDF("id", "text")
    val out = TextDedup.winnowAlignedRuns(docs, "id", "text",
      gramN = 3, window = 4, minShared = 2, maxBucket = 16).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 21L)
    val estRun = r.getAs[Long]("est_run")
    // a 10-word run has 8 gram starts; winnowing keeps a subset, so the
    // aligned span estimate is bounded by the true run length and must
    // cover at least one full winnowing window
    assert(estRun >= 3 + 4 - 1 && estRun <= 10, s"est_run=$estRun")
    assert(r.getAs[Long]("n_aligned") >= 2)
  }

  test("bands must divide the 16 minhash seeds") {
    intercept[IllegalArgumentException](
      TextDedup.minhashCandidates(corpus, "id", "text", bands = 3))
  }

  test("lineDedup keeps each line at its first (id, pos) home; short docs drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // doc 1: four lines, one internal repeat (c at pos 1 and 3)
      (1L, "a.b.c.c.d"),
      // doc 2: shares a and c with doc 1 -> loses both, keeps only its own
      (2L, "a.x.c"),
      // doc 3: all original lines
      (3L, "p.q.r")
    ).toDF("id", "text")
    val out = graft.operators.TextDedup
      .lineDedup(docs, "id", "text", delim = ".", minLines = 3)
      .orderBy("id")
      .collect()
    // doc 1 keeps a,b,c,d (the second c was a within-doc repeat);
    // doc 2 is left with only x -> dropped below minLines;
    // doc 3 untouched
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("text") == "a.b.c.d")
    assert(byId(1L).getAs[Long]("n_lines") == 5L && byId(1L).getAs[Long]("n_kept") == 4L)
    assert(byId(3L).getAs[String]("text") == "p.q.r")
  }

  test("dupSpanCoverage counts positions under cross-doc duplicated grams") {
    val s = spark
    import s.implicits._
    // docs 1 and 2 share "a b c d e" (positions 0-4 in both); doc 3 shares
    // nothing; doc 4 is too short to hold a 5-gram
    val df = Seq(
      (1L, "a b c d e x y z w v"),
      (2L, "q a b c d e r s t u"),
      (3L, "k l m n o p j h g f"),
      (4L, "a b")
    ).toDF("id", "text")
    val out = TextDedup.dupSpanCoverage(df, "id", "text", gramN = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((10L, 5L, 500000L)), out) // 5 of 10 positions covered
    assert(out(2L) == ((10L, 5L, 500000L)), out) // positions 1-5
    assert(out(3L) == ((10L, 0L, 0L)), out)
    assert(out(4L) == ((2L, 0L, 0L)), out) // shorter than gramN: zero, not dropped
  }

  test("dupSpanCoverage merges overlapping spans (no double counting)") {
    val s = spark
    import s.implicits._
    // both docs contain "a b c d e f": two overlapping duplicated 5-grams
    // covering 6 distinct positions, not 10
    val df = Seq(
      (1L, "a b c d e f x y"),
      (2L, "z a b c d e f w")
    ).toDF("id", "text")
    val out = TextDedup.dupSpanCoverage(df, "id", "text", gramN = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 6L, 2L -> 6L), out)
  }

  test("clusterRepresentatives keeps the highest-quality member, ties to min id") {
    val s = spark
    import s.implicits._
    val cls = Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("id", "cluster")
    val q = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 3L), (21L, 3L))
      .toDF("id", "quality")
    val out = TextDedup.clusterRepresentatives(cls, q)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cluster 10: 11 and 12 tie on quality 9 -> smaller id 11 wins, size 3
    assert(out(10L) == ((11L, 9L, 3L)), out)
    // cluster 20: 20 and 21 tie on quality 3 -> 20 wins, size 2
    assert(out(20L) == ((20L, 3L, 2L)), out)
  }

  /** 60-bit md5-prefix gram hash — the same value `ngram_g` computes. */
  private def md5Prefix60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Straight-line winnowing reference: slide the window, take the min hash,
    * ties to the rightmost position; docs with fewer grams than the window
    * use one window spanning everything.
    */
  private def bruteWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val grams = text.split(" ").sliding(k).filter(_.length == k)
      .map(g => md5Prefix60(g.mkString(" "))).toArray
    val n = grams.length
    (0 to math.max(n - w, 0)).flatMap { ws =>
      val window = ws to math.min(ws + w - 1, n - 1)
      if (window.isEmpty) None
      else {
        val mn = window.map(grams).min
        val p = window.filter(grams(_) == mn).max
        Some((p, grams(p)))
      }
    }.toSet
  }

  test("winnowFingerprints matches brute force (ties, short docs, single-window docs)") {
    val s = spark
    import s.implicits._
    val extra = Seq(
      (20L, "x y x y x y x y x y"),  // repeated grams: exercises the rightmost-tie rule
      (21L, "only two"),             // fewer words than gramN: no grams, no fingerprints
      (22L, "four words right here") // 2 grams < window: one global window
    ).toDF("id", "text")
    val docs = corpus.union(extra)
    val got = TextDedup.winnowFingerprints(docs, "id", "text", gramN = 3, window = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet }
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- texts) {
      val want = bruteWinnow(text, 3, 4)
      assert(got.getOrElse(id, Set.empty[(Int, Long)]) == want, s"doc $id")
    }
    assert(!got.contains(21L))           // degenerate doc yields nothing
    assert(got(22L).size == 1)           // single window -> exactly one fingerprint
    assert(got(10L) == got(11L))         // identical docs -> identical sketches
  }

  test("winnowCandidates pairs dup and near-dup docs, never unrelated ones") {
    val cand = TextDedup.winnowCandidates(corpus, "id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical docs share their whole sketch
    assert(cand.contains((10L, 11L)) && cand((10L, 11L)) >= 2, cand)
    // 10 and 12 share an 8-word run >= window + gramN - 1 = 6 -> guaranteed pair
    assert(cand.contains((10L, 12L)), cand)
    assert(!cand.keys.exists { case (a, b) => a >= 13L || b >= 13L }, cand)
  }

  test("exactAlignedRuns: the exact longest common token run, including the overshoot case") {
    val s = spark
    import s.implicits._
    // pair (1,2): two SEPARATE 3-token runs at the same alignment with a
    // one-token gap — a same-offset span estimate would bridge the gap and
    // read 7, but the exact longest run is 3 (the documented overshoot
    // direction; each run is one isolated gram-diagonal match, 1 + gramN-1
    // = 3). pair (1,3): one clean 5-token run (3 consecutive gram matches
    // on one diagonal). pair (1,4): no shared gram -> exact_run 0 (every
    // common run is below the gramN resolution).
    val docs = Seq(
      (1L, "a b c GAP1 e f g t1 t2 t3"),
      (2L, "a b c GAP2 e f g u1 u2 u3"),
      (3L, "z1 a b c GAP1 e z2 z3 z4 z5"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = TextDedup.exactAlignedRuns(docs, "id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 3L, s"gapped diagonal must NOT bridge: $out")
    assert(out((1L, 3L)) == 5L, out.toString)
    assert(out((1L, 4L)) == 0L, s"no shared token -> 0: $out")
    // pass-through: extra pair columns survive
    val withExtra = TextDedup.exactAlignedRuns(docs, "id", "text",
      pairs.withColumn("est_run", lit(7L)))
    assert(withExtra.columns.toSet == Set("a", "b", "est_run", "exact_run"))
  }

  test("dedupClusters memo: same frame per (session, dir); invalidate forces recompute") {
    val dir = "/root/testdata/sf0.001"
    val first = graft.queries.DataQueries3.dedupClusters(spark, dir)
    // memo hit: the SAME persisted frame object is shared by d15/d17/d40
    assert(graft.queries.DataQueries3.dedupClusters(spark, dir) eq first)
    graft.queries.DataQueries3.invalidateClusters(spark, dir)
    val second = graft.queries.DataQueries3.dedupClusters(spark, dir)
    // post-invalidation: a fresh computation (the old snapshot is dropped)
    assert(second ne first)
    assert(second.count() == first.count())
    graft.queries.DataQueries3.invalidateClusters(spark, dir)
  }
}
