package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-13 queries (d134+). The oracle gate pins exact
  * values at sf0.01; these pin the cross-query guarantees — the banded
  * decontamination path agrees with its own exact baseline, and residual
  * PQ actually buys recall at the same code budget.
  */
class Wave7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d134 exact side IS d126's answer (same NN, same score, per query)") {
    val d126 = q("d126_semantic_decon")
      .select(col("qid"), col("nn_id").as("nn126"), col("cos_q6").as("cos126"))
    val d134 = q("d134_banded_decon")
      .select(col("qid"), col("nn_id"), col("cos_q6"))
    val joined = d134.join(d126, Seq("qid"), "full")
    assert(joined.filter(col("nn_id").isNull || col("nn126").isNull ||
      col("nn_id") =!= col("nn126") || col("cos_q6") =!= col("cos126")).count() == 0,
      "banded query's exact baseline must be byte-identical to d126")
  }

  test("d134 banded hit implies the banded NN equals the exact NN") {
    val rows = q("d134_banded_decon")
      .select("nn_id", "band_nn_id", "hit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hit = r.getBoolean(2)
      val agree = !r.isNullAt(1) && r.getLong(0) == r.getLong(1)
      assert(hit == agree, s"hit flag inconsistent: $r")
    }
    // the banded path must find the true NN for a nontrivial share of
    // queries at this config (measured 10/25 at sf0.001; pin > 0 so a
    // banding regression to zero recall cannot land silently)
    assert(rows.count(_.getBoolean(2)) > 0)
  }

  test("cutDupSpans equals brute-force span removal on a crafted corpus") {
    val s = spark
    import s.implicits._
    // docs 0/1 share the 6-word run "a b c d e f" (two 5-grams, df=2);
    // doc 2 is unique; doc 3 is shorter than a 5-gram and passes through
    val corpus = Seq(
      (0L, "a b c d e f x y z w v u"),
      (1L, "p q r s t a b c d e f m n o k"),
      (2L, "zz yy xx ww vv uu tt ss rr qq"),
      (3L, "one two three")).toDF("doc_id", "text")
    val got = operators.TextDedup.cutDupSpans(corpus, "doc_id", "text", 5, 2)
      .select("doc_id", "n_tok", "n_cut", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // brute force: a word is cut iff some 5-gram covering it occurs in
    // >= 2 distinct documents
    val words = Map(0L -> "a b c d e f x y z w v u", 1L -> "p q r s t a b c d e f m n o k",
      2L -> "zz yy xx ww vv uu tt ss rr qq", 3L -> "one two three")
      .map { case (k, v) => k -> v.split(" ").toSeq }
    val gramDocs = words.toSeq
      .flatMap { case (id, w) => w.sliding(5).filter(_.size == 5).map(g => (g.mkString(" "), id)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    for ((id, w) <- words) {
      val dup = (0 to w.size - 5).filter(p =>
        gramDocs(w.slice(p, p + 5).mkString(" ")) >= 2)
      val covered = dup.flatMap(p => p until p + 5).toSet
      val kept = w.zipWithIndex.collect { case (x, i) if !covered(i) => x }
      val (_, nTok, nCut, text) = got(id)
      assert(nTok == w.size && nCut == covered.size && text == kept.mkString(" "),
        s"doc $id: got ($nTok, $nCut, '$text') expected (${w.size}, ${covered.size}, '${kept.mkString(" ")}')")
    }
    assert(got(0L)._3 == 6 && got(1L)._3 == 6 && got(2L)._3 == 0 && got(3L)._3 == 0)
  }

  test("applyMerges kernel reproduces the trainer's mergePair fold") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "abab aab b ba"), (1L, "bbb  aaa"), (2L, "ab"))
      .toDF("doc_id", "text")
    val merges = Seq("a b", "ab ab")
    val viaKernel = operators.BpeTokenizer.encode(corpus, "doc_id", "text", merges)
      .select(col("doc_id"), col("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    // reference: per word, chars -> the trainer's mergePair column fold,
    // applied merge-by-merge, concatenated in document order
    val chars = expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))")
    val folded = merges.foldLeft(chars) { (c, m) =>
      val Array(a, b) = m.split(" ", 2)
      graft.queries.DataQueries9.mergePair(c, a, b)
    }
    val viaFold = corpus
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("__p", "__w")))
      .filter(length(col("__w")) >= 1)
      .select(col("doc_id"), col("__p"), folded.as("syms"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p"), col("syms")))),
        x => x.getField("syms"))).as("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaKernel == viaFold)
    assert(viaKernel(0L) == Seq("abab", "a", "ab", "b", "b", "a"))
  }

  test("encode -> SequencePacking composition: bins respect seqLen on BPE counts") {
    val enc = operators.BpeTokenizer.encode(
      graft.sources.Tables.load(spark, dir, "documents"), "doc_id", "text",
      Seq("t h", "th e", "a n"))
    val packed = operators.SequencePacking
      .packGreedy(enc, "doc_id", "n_tok", 2048, 8)
    val docs = enc.count()
    assert(packed.count() == docs, "every encoded doc packs exactly once")
    // every multi-doc sequence holds within budget; only a single oversized
    // doc may exceed it (next-fit gives it a bin of its own)
    val bad = packed.groupBy("seq")
      .agg(sum("n_tok").as("fill"), count(lit(1)).as("nd"))
      .filter(col("fill") > 2048 && col("nd") > 1)
    assert(bad.count() == 0, "multi-doc sequence over budget")
  }

  test("d135: residual ADC recall@3 >= raw ADC recall@3 at the same code budget") {
    val r = q("d135_residual_pq")
      .agg(sum("hits_raw").cast("long"), sum("hits_res").cast("long"),
        min("k").cast("long"), max("k").cast("long")).head()
    val (raw, res) = (r.getLong(0), r.getLong(1))
    assert(r.getLong(2) == 3 && r.getLong(3) == 3, "exact top-3 must have k=3")
    assert(res >= raw, s"residual PQ must not lose to raw PQ: raw=$raw res=$res")
    assert(res > 0, "residual arm must recover at least one true neighbor")
  }
}
