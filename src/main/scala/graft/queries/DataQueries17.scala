package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Wave 14 (round 13) — the language-model estimation and ingest-planning
  * reads that sit between the counting layer (d14/d28/d70) and the
  * allocation layer (d107/d108): a real smoothed LM estimate
  * (Kneser-Ney), the DoReMi-style mixture reweight it feeds, classifier
  * calibration against the deployed rule filter, the incremental-ingest
  * admission curve, and robust (median/MAD) outlier rates.
  *
  * Numeric discipline as established: integer counts everywhere, products
  * routed through DECIMAL(38,0) where token-mass magnitudes would wrap
  * Long (the Allocation precedent), per-row doubles only where d53's
  * precedent applies (pow/exp on a bounded per-key table, quantized q6
  * before anything crosses rows).
  */
object DataQueries17 {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Non-empty word array of `text` (d79's tokenization). */
  private val wordsExpr = "filter(split(text, ' '), x -> length(x) >= 1)"

  val queries: Map[String, Q] = Map[String, Q](
    // interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    // Chen & Goodman 1998) for the top-20 bigrams — the real smoothed-LM
    // estimate behind perplexity-style filtering (d28/d117 score raw
    // counts; KN is what an actual n-gram LM ships). With discount
    // D = 3/4, P(w2|w1) = [max(4*c12-3, 0)*Ntot + 3*N1f(w1)*N1r(w2)]
    // / (4*c1(w1)*Ntot) — a single rational, so the q9 quantization is
    // one integer floor-division, exact on any engine. The continuation
    // count N1r (distinct LEFT contexts of w2) is KN's signature: "how
    // many contexts does this word complete", not "how often does it
    // occur". Scale: the pair stream is a narrow per-doc zip (no window,
    // no shuffle until the count rollup); the c12 table is vocab²-bounded
    // and persisted once for its four marginal consumers; the top-20 is a
    // bounded TakeOrdered and every marginal join happens AFTER it (20-row
    // broadcast side). The q9 numerator reaches ~c12·Ntot·1e9 — Long
    // wraps at web scale, so the arithmetic runs in DECIMAL(38,0)
    // (the Allocation precedent).
    "d138_kneser_ney" -> ((s, dir) => {
      val bg = docs(s, dir)
        .select(expr(wordsExpr).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))"))
          .as("p"))
        .select(col("p.w1"), col("p.w2"))
      val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .transform(graft.sources.Caches.ephemeral)
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val n1f = c12.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
      val n1r = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
      val nt = c12.agg(count(lit(1)).as("ntot"))
      c12.orderBy(col("c12").desc, col("w1"), col("w2")).limit(20)
        .join(c1, "w1").join(n1f, "w1").join(n1r, "w2")
        .crossJoin(broadcast(nt))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("n1f"),
          col("n1r"), col("ntot"),
          expr("""CAST((CAST(GREATEST(4 * c12 - 3, 0) AS DECIMAL(38,0)) * ntot * 1000000000
                 |  + CAST(3 AS DECIMAL(38,0)) * n1f * n1r * 1000000000)
                 |  DIV (CAST(4 AS DECIMAL(38,0)) * c1 * ntot) AS BIGINT)""".stripMargin)
            .as("p_kn_q9"))
        .orderBy(col("c12").desc, col("w1"), col("w2"))
    }),

    // classifier calibration against the deployed rule filter: the d79
    // hashed-linear score binned into fixed-width score bands (floor
    // division via pmod so negative scores bin identically across
    // engines — never ntile, which would sort the corpus), each band
    // scored by how often the d39 Gopher-rule filter agrees (keep rate).
    // The reliability read behind replacing rules with a model at 100 TB:
    // a well-calibrated score is monotone in keep rate and the crossover
    // band locates the operating threshold. Two narrow corpus passes
    // (score fold, rule arithmetic), one equi-join on doc_id, one bounded
    // per-band rollup; keep_rate_q6 is an exact integer division.
    "d140_calibration" -> ((s, dir) => {
      val scored = docs(s, dir)
        .select(col("doc_id"), expr(wordsExpr).as("ws"))
        .select(col("doc_id"),
          expr(
            """aggregate(ws, CAST(0 AS BIGINT), (acc, w) -> acc +
              |  ((CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % 64)
              |    * 2654435761 % 1000 - 500))""".stripMargin).as("score"))
      val rules = graft.operators.TextQuality.withQualityRules(docs(s, dir), "text")
        .select(col("doc_id"), col("keep"))
      scored.join(rules, "doc_id")
        .withColumn("bin", expr("(score - pmod(score, 2000)) DIV 2000"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          min(col("score")).as("min_score"), max(col("score")).as("max_score"))
        .withColumn("keep_rate_q6", expr("n_keep * 1000000 DIV n"))
        .orderBy("bin")
    }),

    // incremental-ingest admission curve: docs arrive in 4 deterministic
    // shards (doc_id mod 4 as the arrival clock), and a doc is ADMITTED
    // iff it is the globally-first occurrence of its exact content hash
    // (min (shard, doc_id) struct per hash — one two-phase rollup, the
    // d77 keeper-election shape). Beside it, marginal NOVELTY: how many
    // 5-gram types see their first occurrence in each shard — the
    // "what does the next crawl day actually add" read behind continuing
    // vs stopping a crawl (appendToIndex is the mechanism; this is the
    // analytic curve that prices it). Grams cross the rollup as 60-bit
    // kernel hashes; every post-rollup table is 4 rows.
    "d141_shard_admission" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % 4).as("shard"), md5(col("text")).as("h"))
      val first = d.groupBy(col("h"))
        .agg(min(struct(col("shard"), col("doc_id"))).as("f"))
        .select(col("h"), col("f.shard").as("fs"), col("f.doc_id").as("fd"))
      val adm = d.join(first, "h")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("fd"), 1L).otherwise(0L)).as("n_admitted"))
      val novel = docs(s, dir)
        .select((col("doc_id") % 4).as("shard"), col("doc_id"),
          explode(array_distinct(graft.functions.prom.shingle_g(col("text"), 5))).as("g"))
        .groupBy(col("g"))
        .agg(min(struct(col("shard"), col("doc_id"))).as("f"))
        .select(col("f.shard").as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_new_gram_types"))
      val w = Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, 0)
      adm.join(novel, Seq("shard"), "left")
        .select(col("shard"), col("n_docs"), col("n_admitted"),
          (col("n_docs") - col("n_admitted")).as("n_dup"),
          coalesce(col("n_new_gram_types"), lit(0L)).as("n_new_gram_types"))
        .withColumn("cum_new_types", sum(col("n_new_gram_types")).over(w))
        .orderBy("shard")
    }),

    // robust per-source outlier rate on document length (n_chars): exact
    // median and MAD via rank arithmetic on the DISTINCT-length count
    // table (the d26/q20 discipline — windows only ever run over the
    // |sources| × |distinct lengths| table, never the corpus), both
    // doubled so even-count medians stay integers (med2 = 2·median,
    // mad4 = 4·MAD), and the 3-sigma-equivalent rule |len − med| > 3·MAD
    // becomes the integer predicate 2·|2·len − med2| > 3·mad4. The
    // length-quality read that a mean/stddev z-score gets wrong on
    // heavy-tailed web text (one giant page drags the mean; the median
    // doesn't move).
    "d142_mad_outliers" -> ((s, dir) => {
      val lc = docs(s, dir).select(col("source"), col("n_chars").as("len"))
        .groupBy(col("source"), col("len"))
        .agg(count(lit(1)).as("cnt"))
        .transform(graft.sources.Caches.ephemeral)
      def med2Of(t: DataFrame, valCol: String): DataFrame = {
        val wc = Window.partitionBy(col("source")).orderBy(col(valCol))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wn = Window.partitionBy(col("source"))
        t.withColumn("cum", sum(col("cnt")).over(wc))
          .withColumn("nn", sum(col("cnt")).over(wn))
          .groupBy(col("source"))
          .agg(max(col("nn")).as("n"),
            (min(when(col("cum") >= expr("(nn + 1) DIV 2"), col(valCol))) +
              min(when(col("cum") >= expr("(nn + 2) DIV 2"), col(valCol))))
              .as("m2"))
      }
      val med = med2Of(lc, "len").withColumnRenamed("m2", "med2")
        .select(col("source"), col("n"), col("med2"))
      val aTab = lc.join(med, "source")
        .select(col("source"), abs(lit(2) * col("len") - col("med2")).as("a"), col("cnt"))
        .groupBy(col("source"), col("a"))
        .agg(sum(col("cnt")).as("cnt"))
      val mad = med2Of(aTab, "a").withColumnRenamed("m2", "mad4")
        .select(col("source"), col("mad4"))
      val out = lc.join(med, "source").join(mad, "source")
        .groupBy(col("source"))
        .agg(sum(when(lit(2) * abs(lit(2) * col("len") - col("med2")) >
          lit(3) * col("mad4"), col("cnt")).otherwise(0L)).as("n_out"))
      med.join(mad, "source").join(out, "source")
        .select(col("source"), col("n"), col("med2"), col("mad4"), col("n_out"),
          expr("n_out * 1000000 DIV n").as("out_rate_q6"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    "d138_kneser_ney" ->
      """WITH w AS (SELECT list_filter(string_split(text, ' '), x -> length(x) >= 1) AS w FROM documents),
        |u AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM w WHERE len(w) >= 2),
        |bg AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM u),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        |n1f AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1f FROM c12 GROUP BY w1),
        |n1r AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1r FROM c12 GROUP BY w2),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM c12),
        |top AS (SELECT * FROM c12 ORDER BY c12 DESC, w1, w2 LIMIT 20)
        |SELECT t.w1, t.w2, t.c12, c1.c1, n1f.n1f, n1r.n1r, nt.ntot,
        |  CAST((CAST(greatest(4 * t.c12 - 3, 0) AS HUGEINT) * nt.ntot * 1000000000
        |    + CAST(3 AS HUGEINT) * n1f.n1f * n1r.n1r * 1000000000)
        |    // (CAST(4 AS HUGEINT) * c1.c1 * nt.ntot) AS BIGINT) AS p_kn_q9
        |FROM top t JOIN c1 USING (w1) JOIN n1f USING (w1) JOIN n1r USING (w2) CROSS JOIN nt
        |ORDER BY t.c12 DESC, t.w1, t.w2""".stripMargin,

    "d140_calibration" ->
      """WITH sc AS (SELECT doc_id,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [ (CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 64) * 2654435761 % 1000 - 500
        |        FOR x IN list_filter(string_split(text, ' '), x -> length(x) >= 1) ]),
        |      (acc, v) -> acc + v) AS BIGINT) AS score
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, len(w) AS n_words,
        |  list_reduce(list_prepend(0, [length(x) FOR x IN w]), (acc, el) -> acc + el) AS sum_wlen,
        |  len(list_intersect(list_distinct(w), ['the','a','of','and','to'])) AS stop_hits
        |FROM w),
        |rk AS (SELECT doc_id, (n_words >= 50 AND n_words <= 100000
        |    AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words
        |    AND stop_hits >= 2) AS keep FROM b),
        |j AS (SELECT sc.doc_id, sc.score, rk.keep,
        |    CAST((sc.score - (((sc.score % 2000) + 2000) % 2000)) // 2000 AS BIGINT) AS bin
        |  FROM sc JOIN rk ON sc.doc_id = rk.doc_id)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(min(score) AS BIGINT) AS min_score, CAST(max(score) AS BIGINT) AS max_score,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS keep_rate_q6
        |FROM j GROUP BY bin ORDER BY bin""".stripMargin,

    "d141_shard_admission" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 AS shard, md5(text) AS h, text FROM documents),
        |f AS (SELECT h, min(shard * 4294967296 + doc_id) AS fk FROM d GROUP BY h),
        |adm AS (SELECT d.shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN d.shard * 4294967296 + d.doc_id = f.fk THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
        |  FROM d JOIN f USING (h) GROUP BY d.shard),
        |w AS (SELECT doc_id, shard, string_split(text, ' ') AS w FROM d WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT DISTINCT doc_id, shard,
        |    CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]), 1, 15)) AS BIGINT) AS g
        |  FROM (SELECT doc_id, shard, w, unnest(generate_series(1, len(w) - 4)) AS i FROM w)),
        |gf AS (SELECT g, min(shard * 4294967296 + doc_id) AS fk FROM g GROUP BY g),
        |nv AS (SELECT CAST(fk // 4294967296 AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_new_gram_types
        |  FROM gf GROUP BY 1)
        |SELECT adm.shard, adm.n_docs, adm.n_admitted,
        |  adm.n_docs - adm.n_admitted AS n_dup,
        |  COALESCE(nv.n_new_gram_types, 0) AS n_new_gram_types,
        |  CAST(sum(COALESCE(nv.n_new_gram_types, 0)) OVER (ORDER BY adm.shard) AS BIGINT) AS cum_new_types
        |FROM adm LEFT JOIN nv USING (shard) ORDER BY adm.shard""".stripMargin,

    "d142_mad_outliers" ->
      """WITH lc AS (SELECT source, n_chars AS len, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY source, n_chars),
        |cm AS (SELECT source, len, cnt,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY source) AS nn
        |  FROM lc),
        |med AS (SELECT source, CAST(max(nn) AS BIGINT) AS n,
        |    CAST(min(CASE WHEN cum >= (nn + 1) // 2 THEN len END)
        |      + min(CASE WHEN cum >= (nn + 2) // 2 THEN len END) AS BIGINT) AS med2
        |  FROM cm GROUP BY source),
        |at AS (SELECT lc.source, abs(2 * lc.len - med.med2) AS a, CAST(sum(lc.cnt) AS BIGINT) AS cnt
        |  FROM lc JOIN med USING (source) GROUP BY lc.source, abs(2 * lc.len - med.med2)),
        |ac AS (SELECT source, a, cnt,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY source) AS nn
        |  FROM at),
        |mad AS (SELECT source,
        |    CAST(min(CASE WHEN cum >= (nn + 1) // 2 THEN a END)
        |      + min(CASE WHEN cum >= (nn + 2) // 2 THEN a END) AS BIGINT) AS mad4
        |  FROM ac GROUP BY source),
        |outc AS (SELECT lc.source,
        |    CAST(sum(CASE WHEN 2 * abs(2 * lc.len - med.med2) > 3 * mad.mad4 THEN lc.cnt ELSE 0 END) AS BIGINT) AS n_out
        |  FROM lc JOIN med USING (source) JOIN mad USING (source) GROUP BY lc.source)
        |SELECT med.source, med.n, med.med2, mad.mad4, outc.n_out,
        |  CAST(outc.n_out * 1000000 // med.n AS BIGINT) AS out_rate_q6
        |FROM med JOIN mad USING (source) JOIN outc USING (source)
        |ORDER BY med.source""".stripMargin
  )
}
