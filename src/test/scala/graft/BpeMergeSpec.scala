package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The BPE greedy-merge fold (DataQueries9.mergePair) against an imperative
  * reference implementation of left-to-right greedy pair merging — the
  * subtle cases are self-overlapping pairs ("aaa" under (a,a) must become
  * [aa, a], "aaaa" [aa, aa]) and merges that re-expose the pair's first
  * symbol. The fold's correctness carries d76/d80's training loop.
  */
class BpeMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Canonical left-to-right greedy merge: scan, fuse (a, b) pairs, skip
    * past each fuse.
    */
  private def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("mergePair fold matches the imperative greedy merge on adversarial + random words") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab" // tiny alphabet maximizes self-overlap collisions
    val words =
      Seq("aaa", "aaaa", "aab", "abb", "abab", "aabb", "bbaa", "ababa", "a", "ab") ++
        Seq.fill(300)((0 until (1 + rnd.nextInt(12)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length)).toString).mkString)
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    for ((a, b) <- pairs) {
      val df = words.toDF("w")
        .select(col("w"),
          org.apache.spark.sql.functions.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
        .select(col("w"),
          graft.queries.DataQueries9.mergePair(col("syms"), a, b).as("m"))
      val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        val expect = greedy(w.map(_.toString).toVector, a, b)
        assert(got(w) == expect,
          s"word '$w' pair ($a,$b): got ${got(w)} expected $expect")
      }
    }
  }

  test("batched trainer: rounds << merges, per-round selections symbol-disjoint") {
    val dir = "/root/testdata/sf0.001"
    val (merges, totals) = graft.queries.DataQueries9.bpeBatchRun(spark, dir)
    val rounds = merges.map(_._1).distinct.size
    assert(rounds <= graft.queries.DataQueries9.BatchRounds)
    assert(merges.size >= 64,
      s"the production-vocab path must train >= 64 merges, got ${merges.size}")
    assert(merges.size >= 8 * rounds,
      "batching must select many merges per corpus rollup (rounds << merges)")
    // greedy invariant: within a round, accepted merges touch disjoint symbols
    merges.groupBy(_._1).foreach { case (r, ms) =>
      val sets = ms.map(_._3.split(' ').toSet).toVector
      for (i <- sets.indices; k <- i + 1 until sets.size)
        assert((sets(i) & sets(k)).isEmpty,
          s"round $r merges ${sets(i)} and ${sets(k)} share a symbol")
    }
    // every round makes progress and compresses the corpus monotonically
    assert(totals.size == rounds + 1)
    totals.map(_._2).sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev, s"round total must strictly decrease: $prev -> $next")
    }
  }

  test("applyMerges over the batch merge list reproduces the trained state exactly") {
    val s = spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val (merges, totals) = graft.queries.DataQueries9.bpeBatchRun(spark, dir)
    // the encode kernel runs the same pass-per-merge fold the trainer
    // applied, so tokenizing the corpus with the FULL (round, rank)-ordered
    // merge list must land on the final training total — the d137
    // composition the r13 verdict asked to demonstrate at >= 64 merges
    val mergeArr = array(merges.map(m => lit(m._3)): _*)
    val total = graft.sources.Tables.load(spark, dir, "documents")
      .select(size(graft.functions.prom.apply_merges(col("text"), mergeArr)).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == totals.last._2,
      s"encode total $total != trained final total ${totals.last._2}")
  }

  test("two different literal merge lists in ONE projection stay independent") {
    // the per-thread compile cache is reference-keyed with 4 LRU slots; a
    // projection evaluating two kernels under two vocabularies alternates
    // keys every row — results must never cross-contaminate (and a cache
    // regression to one slot would only slow it, never corrupt it, but
    // this pins the correctness side of the multi-literal case)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("a b c d", "b c a b").toDF("text")
    val m1 = array(lit("a b"), lit("ab c")) // chained: 2nd fires after 1st
    val m2 = array(lit("c d"), lit("b cd"))
    val merged = df.select(
      graft.functions.prom.apply_merges_words(col("text"), m1).as("t1"),
      graft.functions.prom.apply_merges_words(col("text"), m2).as("t2"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    assert(merged(0)._1 == Seq("abc", "d") && merged(0)._2 == Seq("a", "bcd"))
    assert(merged(1)._1 == Seq("b", "c", "ab")
      && merged(1)._2 == Seq("b", "c", "a", "b"))
    // wordpiece: two lexicons side by side, character maximal munch per word
    val wp = Seq("abcd cdab").toDF("text").select(
      graft.functions.prom.wordpiece(col("text"), array(lit("a"), lit("b"),
        lit("c"), lit("d"), lit("ab"))).as("w1"),
      graft.functions.prom.wordpiece(col("text"), array(lit("a"), lit("b"),
        lit("c"), lit("d"), lit("cd"))).as("w2"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    assert(wp(0)._1 == Seq("ab", "c", "d", "c", "d", "ab"))
    assert(wp(0)._2 == Seq("a", "b", "cd", "cd", "a", "b"))
  }
}
