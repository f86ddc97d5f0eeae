package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Fifth wave of training-data pipeline operators: SimHash band blocking
  * (the Hamming-space near-dup candidate generator), cross-source overlap
  * auditing, SRP-banded embedding near-dup with exact-cosine verification
  * (the full semantic-dedup pipeline), and the Gopher-style repetition and
  * quality-rule filters. Every candidate generator uses the bucket-shuffle
  * pair expansion (groupBy bucket -> sorted collect -> in-array pairs) — no
  * self-joins, no corpus-sized broadcasts; the filters are pure narrow maps.
  */
object DataQueries5 {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  private def dot(a: Column, b: Column): Column = graft.functions.prom.vec_dot(a, b)
  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Expand a sorted id array into its (a, b), a &lt; b combinations — the
    * reducer-side pair generator shared by every banded candidate query.
    */
  private[queries] def pairExpand(ids: Column): Column =
    explode(flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y => struct(x.as("a"), y.as("b"))))))

  /** d35's candidate generator, shared with the d48 verification stage:
    * (a, b) pairs of docs whose 64-bit simhash agrees on any 16-bit band.
    */
  private[queries] def simhashCandidates(s: SparkSession, dir: String): DataFrame = {
    val sig = docs(s, dir)
      .select(col("doc_id"), graft.functions.prom.simhash64(col("text")).as("sh"))
    val buckets = sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b =>
        xxhash64(lit(b), substring(col("sh"), b * 16 + 1, 16))): _*)).as("bk"))
    buckets.groupBy(col("bk"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(pairExpand(col("ids")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // SimHash band blocking: near-dup candidates in Hamming space — docs
    // whose 64-bit simhash agrees on any 16-bit band. The signature is one
    // codegen'd kernel call (zero shuffle); banding shuffles 8-byte bucket
    // keys (xxhash64 of band id + band bits) and docs sharing a bucket meet
    // in one reducer that emits the pairs directly. At 100 TB a bucket-size
    // cap bounds the per-bucket quadratic fan-out (boilerplate-heavy crawls
    // concentrate signatures); the synthetic corpus needs none.
    "d35_simhash_band" -> ((s, dir) =>
      simhashCandidates(s, dir).orderBy("a", "b")),

    // SimHash verify — closes the Hamming-space generate->verify loop the
    // way d32 (edit distance) and d37 (exact cosine) do for their families:
    // the exact 64-bit Hamming distance is computed for ONLY the d35 band
    // candidates (signatures join in by two hash equi-joins; the per-pair
    // bit compare prices on |candidates|, never corpus^2). dup = distance
    // <= 8 bits, the standard simhash near-dup threshold.
    "d48_simhash_verify" -> ((s, dir) => {
      val sig = docs(s, dir)
        .select(col("doc_id"), graft.functions.prom.simhash64(col("text")).as("sh"))
      simhashCandidates(s, dir)
        .join(sig.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(sig.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
        .withColumn("hamming",
          graft.functions.prom.hamming64(col("sha"), col("shb")))
        .select(col("a"), col("b"), col("hamming"),
          (col("hamming") <= 8).as("dup"))
        .orderBy("a", "b")
    }),

    // cross-source overlap matrix: how many distinct word 3-grams each pair
    // of sources shares — the corpus-composition audit behind dedup-across-
    // dumps decisions. Shape: ONE shuffle on the gram hash; collect_set
    // dedups sources in-aggregate (bounded O(|sources|) state, ~20, with
    // map-side partials — no separate distinct pass), then the reducer
    // pair-expands the set; output is |sources|^2 rows. No side is ever
    // broadcast and nothing quadratic in the corpus exists.
    "d36_source_overlap" -> ((s, dir) => {
      val sh = docs(s, dir)
        .select(col("source"), explode(graft.functions.prom.shingle_g(col("text"), 3)).as("g"))
      sh.groupBy(col("g"))
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(pairExpand(col("ss")).as("p"))
        .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
        .agg(count(lit(1)).as("shared"))
        .orderBy("src_a", "src_b")
    }),

    // SRP-banded embedding near-dup — the semantic-dedup pipeline end to
    // end: d24's 16-bit SRP signatures -> 2 8-bit band buckets -> pair
    // expansion -> exact cosine on ONLY the candidate pairs (fold-ordered
    // doubles, bit-identical across engines). The expensive O(dim) cosine
    // touches |candidates| pairs, never corpus^2; texts/vectors join in by
    // two hash equi-joins, neither side force-broadcast.
    "d37_srp_near_dup" -> ((s, dir) => {
      val e = embs(s, dir)
      val cand = graft.operators.VectorSearch
        .srpCandidates(e, "vec_id", "embedding")
      graft.operators.VectorSearch
        .cosineVerify(cand, e, "vec_id", "embedding")
        .withColumn("dup", col("cos") >= 0.9)
        .orderBy("a", "b")
    }),

    // repetition filter (the Gopher/C4 duplicate-content heuristics over
    // word space), via the public TextQuality API — a pure narrow map.
    "d38_repetition" -> ((s, dir) =>
      graft.operators.TextQuality.withRepetitionStats(docs(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
          col("dup_word_frac"), col("n_bigrams"), col("n_distinct_bigrams"),
          col("dup_bigram_frac"))
        .orderBy("doc_id")),

    // dedup savings report — the reporting stage that closes the dedup
    // pipeline: cluster-size histogram over the MinHash-LSH connected
    // components with docs-removable accounting. Both aggregations run over
    // the (already tiny) cluster table, which is the SHARED memoized/
    // persisted d15 result (DataQueries3.dedupClusters) — the CC iteration
    // runs once per pipeline, never re-derived per report. Output is
    // O(max cluster size) rows at any corpus scale.
    "d40_dedup_report" -> ((s, dir) =>
      DataQueries3.dedupClusters(s, dir)
        .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
          sum(col("sz") - 1).as("n_removable"))
        .orderBy("sz")),

    // cross-shard dedup — dedupe a NEW dump (source != src0) against the
    // EXISTING reference corpus (src0): exact content-hash anti-join plus
    // LSH band-bucket semi-join (near-dup candidates), via the public
    // TextDedup.dedupAgainst API with the bloom pre-filter on (a fixed-size
    // summary of the reference gates the dump before the joins; identical
    // result — blooms have no false negatives — but the join shuffle moves
    // ~|dups|, not |dump|). The incremental-pipeline stage every multi-dump
    // crawl ingest runs.
    "d41_cross_shard_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.TextDedup.dedupAgainst(
          d.filter(col("source") =!= "src0"),
          d.filter(col("source") === "src0"), "doc_id", "text",
          bloomItems = 65536L)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // Gopher-style quality-rule filter via the public TextQuality API:
    // word-count bounds, mean-word-length band as 3n <= sum_len <= 10n (no
    // float mean crosses engines), stopword floor — all integer-exact.
    "d39_quality_rules" -> ((s, dir) =>
      graft.operators.TextQuality.withQualityRules(docs(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("sum_word_len"),
          col("stop_hits"), col("keep"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "d35_simhash_band" ->
      (s"WITH ${DataQueries2.simhashSigCte},\n" +
        """bands AS (SELECT doc_id, b, substr(simhash, b*16 + 1, 16) AS bh FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
          |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
          |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin),

    "d48_simhash_verify" ->
      (s"WITH ${DataQueries2.simhashSigCte},\n" +
        """bands AS (SELECT doc_id, b, substr(simhash, b*16 + 1, 16) AS bh FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
          |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
          |h AS (SELECT p.a, p.b,
          |  CAST(len([i FOR i IN generate_series(1, 64) IF substr(x.simhash, i, 1) <> substr(y.simhash, i, 1)]) AS BIGINT) AS hamming
          |FROM pairs p JOIN sig x ON p.a = x.doc_id JOIN sig y ON p.b = y.doc_id)
          |SELECT a, b, hamming, hamming <= 8 AS dup FROM h ORDER BY a, b""".stripMargin),

    "d36_source_overlap" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT source, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN generate_series(1, len(w) - 2)]) AS sh FROM w)
        |SELECT x.source AS src_a, y.source AS src_b, CAST(count(*) AS BIGINT) AS shared
        |FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
        |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    "d37_srp_near_dup" ->
      (s"WITH ${DataQueries4.srpSigCte},\n" +
        """bands AS (SELECT vec_id, b, substr(sig, b*8 + 1, 8) AS bh FROM sig CROSS JOIN (SELECT unnest([0,1]) AS b)),
          |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.vec_id < y.vec_id),
          |n AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
          |  sqrt(list_reduce(list_prepend(0.0::DOUBLE, [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]), (acc, el) -> acc + el)) AS nrm FROM embeddings),
          |sc AS (SELECT c.a, c.b,
          |  list_reduce(list_prepend(0.0::DOUBLE, [x.v[i] * y.v[i] FOR i IN generate_series(1, len(x.v))]), (acc, el) -> acc + el) / (x.nrm * y.nrm) AS cos
          |FROM cand c JOIN n x ON c.a = x.vec_id JOIN n y ON c.b = y.vec_id)
          |SELECT a, b, cos, cos >= 0.9 AS dup FROM sc ORDER BY a, b""".stripMargin),

    "d38_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |base AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
        |  CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END AS n_bg,
        |  CASE WHEN len(w) >= 2 THEN len(list_distinct([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)])) ELSE 0 END AS n_bg_distinct
        |FROM w)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(n_distinct AS BIGINT) AS n_distinct_words,
        |  CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
        |  CAST(n_bg AS BIGINT) AS n_bigrams, CAST(n_bg_distinct AS BIGINT) AS n_distinct_bigrams,
        |  CASE WHEN n_bg > 0 THEN CAST(n_bg - n_bg_distinct AS DOUBLE) / CAST(n_bg AS DOUBLE) ELSE 0.0 END AS dup_bigram_frac
        |FROM base ORDER BY doc_id""".stripMargin,

    "d40_dedup_report" ->
      ("WITH RECURSIVE " + DataQueries.minhashPairsCte + """,
        |edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
        |nodes AS (SELECT DISTINCT u AS n FROM edges),
        |walk(n, l) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.n),
        |clusters AS (SELECT n AS doc_id, min(l) AS cluster FROM walk GROUP BY n),
        |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM clusters GROUP BY cluster)
        |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(sum(sz - 1) AS BIGINT) AS n_removable
        |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin),

    "d41_cross_shard_dedup" ->
      (s"WITH ${DataQueries.minhashPairsCte},\n" +
        """refdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
          |dropped AS (
          |  SELECT p.b AS doc_id FROM pairs p JOIN refdocs r ON p.a = r.doc_id
          |  UNION SELECT p.a FROM pairs p JOIN refdocs r ON p.b = r.doc_id)
          |SELECT d.doc_id, d.lang, d.source FROM documents d
          |WHERE d.source <> 'src0'
          |  AND md5(d.text) NOT IN (SELECT md5(text) FROM documents WHERE source = 'src0')
          |  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
          |ORDER BY d.doc_id""".stripMargin),

    "d39_quality_rules" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, len(w) AS n_words,
        |  list_reduce(list_prepend(0, [length(x) FOR x IN w]), (acc, el) -> acc + el) AS sum_wlen,
        |  len(list_intersect(list_distinct(w), ['the','a','of','and','to'])) AS stop_hits
        |FROM w)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(sum_wlen AS BIGINT) AS sum_word_len,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  (n_words >= 50 AND n_words <= 100000 AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words AND stop_hits >= 2) AS keep
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
