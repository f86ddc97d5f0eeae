package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.prom.fingerprint64
import graft.sources.Tables

/** Training-data pipeline operators over `documents` / `embeddings`
  * (north-star extensions, BASELINE.md): deduplication (exact, MinHash-LSH,
  * n-gram Jaccard), similarity search (brute-force cosine top-k baseline;
  * LSH-bucketed path is the scale story), text analysis (language-ID,
  * quality scoring, tokenization, fingerprinting), multimodal plumbing.
  *
  * Scale notes: every all-pairs computation is blocked (LSH band buckets /
  * lang+source blocks) so the join is a bucket-equijoin, never a cross join
  * of the corpus; signatures are computed in one aggregation pass.
  */
object DataQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  // --- shared shingling (word 3-grams, distinct) ----------------------------

  /** Distinct word-3-gram shingles of `text` (split on single space). */
  private val shinglesExpr: Column =
    array_distinct(expr(
      "transform(sequence(0, size(split(text, ' ')) - 3), i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"))

  private val MinhashSeeds = 16
  private val Bands = 4 // 4 bands x 4 rows

  /** element-wise double ops with identical left-fold order on both engines
    * => bit-identical cosine, no rounding needed for oracle parity.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  val queries: Map[String, Q] = Map(
    // exact dedup: content-hash groups, canonical = min doc_id
    "d01_dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canonical"))
        .select(col("h"), col("n"), col("canonical"))
        .orderBy("h")),

    // MinHash + LSH near-dup candidates: shingle -> 16 minhashes (one agg
    // pass, no row explosion per seed) -> 4 band buckets -> bucket equijoin
    "d02_minhash_lsh" -> ((s, dir) => {
      val sh = docs(s, dir)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), explode(shinglesExpr).as("sh"))
      val minhashes = (0 until MinhashSeeds)
        .map(i => min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
      val sig = sh.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
      val bands = sig.select(col("doc_id"), explode(array(
        (0 until Bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|", (0 until 4).map(r => col(s"m${4 * b + r}")): _*)).as("bh"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      bands.as("x").join(broadcast(bands.as("y")),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
        .orderBy("a", "b")
    }),

    // n-gram Jaccard near-dup within (lang, source) blocks; integer-exact
    // intersection/union (no float threshold ambiguity).
    // Scale shape: intersections come from a shingle-level equijoin +
    // count aggregation — pair work is proportional to SHARED shingles, not
    // to candidate pairs x set size, and no arrays ever cross a join. (A
    // naive array_intersect self-join gets the filter pushed into the join
    // condition, evaluating set intersections interpreted per pair.)
    "d03_ngram_jaccard" -> ((s, dir) => {
      val base = docs(s, dir).filter(size(split(col("text"), " ")) >= 3)
      val sh = base.select(col("doc_id"), col("lang"), col("source"),
        explode(shinglesExpr).as("sh"))
      val sizes = base.select(col("doc_id"), size(shinglesExpr).cast("long").as("n"))
      val inter = sh.as("x").join(sh.as("y"),
          col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
            && col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("inter"))
      inter.join(broadcast(sizes).as("sa"), col("a") === col("sa.doc_id"))
        .join(broadcast(sizes).as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"), col("inter"),
          (col("sa.n") + col("sb.n") - col("inter")).as("uni"))
        .filter(col("inter") * 20 >= col("uni")) // jaccard >= 0.05, integer-exact
        .orderBy("a", "b")
    }),

    // brute-force cosine top-5 neighbors for query vectors (vec_id < 8);
    // fold-ordered double math => bit-identical scores across engines
    "d04_cosine_topk" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val withNorm = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val q = withNorm.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val scored = q.join(broadcast(withNorm), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy("qid", "rank")
    }),

    // language-ID by stopword-hit scoring (argmax with fixed tie order)
    "d05_langid" -> ((s, dir) => {
      val tok = array_distinct(split(col("text"), " "))
      def hits(words: Seq[String]) =
        size(array_intersect(tok, array(words.map(lit): _*))).cast("long")
      val hEn = hits(Seq("the", "a", "of", "and", "to"))
      val hDe = hits(Seq("der", "die", "das", "und", "ist"))
      val hEs = hits(Seq("el", "la", "de", "los", "y"))
      val hFr = hits(Seq("le", "les", "et", "des", "un"))
      docs(s, dir).select(
        col("doc_id"),
        hEn.as("h_en"), hDe.as("h_de"), hEs.as("h_es"), hFr.as("h_fr"),
        when(hEn >= hDe && hEn >= hEs && hEn >= hFr, "en")
          .when(hDe >= hEs && hDe >= hFr, "de")
          .when(hEs >= hFr, "es")
          .otherwise("fr").as("pred"))
        .orderBy("doc_id")
    }),

    // quality scoring: length/punct/stopword ratios (single-division doubles
    // are IEEE-exact parity; no accumulation)
    "d06_quality" -> ((s, dir) => {
      val nTok = size(split(col("text"), " ")).cast("long")
      val nPunct = size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))).cast("long")
      val nStop = size(regexp_extract_all(col("text"), lit("\\b(the|a|of|and|to)\\b"), lit(0))).cast("long")
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        nPunct.as("n_punct"),
        nStop.as("n_stop"),
        (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
        (length(col("text")).cast("double") / nTok.cast("double")).as("chars_per_token"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace + BPE-ish regex segmentation
    "d07_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")),

    // document fingerprinting: 64-bit rolling hash via custom expression
    "d08_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), fingerprint64(col("text")).as("fp"))
        .orderBy("doc_id")),

    // multimodal plumbing: binary media column -> per-partition (stubbed)
    // decode -> typed features (graft.operators.Multimodal)
    "m01_multimodal" -> ((s, dir) =>
      graft.operators.Multimodal.extractFeatures(
        graft.operators.Multimodal.mediaFromDocuments(docs(s, dir)))
        .toDF()
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS canonical
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,

    "d02_minhash_lsh" -> {
      val seeds = (0 until MinhashSeeds).mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
         |sh AS (SELECT DISTINCT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN generate_series(1, len(w) - 2)]) AS sh FROM w),
         |mh AS (SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mn
         |       FROM sh CROSS JOIN (SELECT unnest([$seeds]) AS seed) GROUP BY doc_id, seed),
         |sig AS (SELECT doc_id, array_agg(mn ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
         |bands AS (SELECT doc_id, band, md5(sig[band*4+1] || '|' || sig[band*4+2] || '|' || sig[band*4+3] || '|' || sig[band*4+4]) AS bh
         |          FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
         |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
         |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin
    },

    "d03_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |ss AS (SELECT doc_id, lang, source,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN generate_series(1, len(w) - 2)]) AS shs
        |       FROM w)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(len(list_intersect(x.shs, y.shs)) AS BIGINT) AS inter,
        |  CAST(len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)) AS BIGINT) AS uni
        |FROM ss x JOIN ss y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
        |WHERE len(list_intersect(x.shs, y.shs)) * 20 >= len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))
        |ORDER BY a, b""".stripMargin,

    "d04_cosine_topk" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0::DOUBLE, [x * x FOR x IN v]), (a, b) -> a + b)) AS nrm FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
        |scored AS (SELECT qid, vec_id,
        |    list_reduce(list_prepend(0.0::DOUBLE, [qv[i] * v[i] FOR i IN generate_series(1, len(v))]), (a, b) -> a + b) / (qn * nrm) AS cos
        |  FROM q JOIN n ON vec_id <> qid),
        |ranked AS (SELECT qid, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "d05_langid" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |  CAST(len(list_intersect(tok, ['the','a','of','and','to'])) AS BIGINT) AS h_en,
        |  CAST(len(list_intersect(tok, ['der','die','das','und','ist'])) AS BIGINT) AS h_de,
        |  CAST(len(list_intersect(tok, ['el','la','de','los','y'])) AS BIGINT) AS h_es,
        |  CAST(len(list_intersect(tok, ['le','les','et','des','un'])) AS BIGINT) AS h_fr
        |FROM t)
        |SELECT doc_id, h_en, h_de, h_es, h_fr,
        |  CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
        |       WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
        |       WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS pred
        |FROM h ORDER BY doc_id""".stripMargin,

    "d06_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS BIGINT) AS n_stop,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
        |  CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d07_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d08_fingerprint" ->
      """WITH f AS (SELECT doc_id,
        |  list_reduce(list_prepend(0::HUGEINT, [unicode(c)::HUGEINT FOR c IN string_split(text, '')]),
        |    (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS h
        |FROM documents)
        |SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |  THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp
        |FROM f ORDER BY doc_id""".stripMargin,

    "m01_multimodal" ->
      """SELECT doc_id, 'application/x-' || source AS mime,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  CAST(strlen(text) % 640 AS BIGINT) AS width,
        |  CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
        |  CAST(strlen(text) // 100 AS BIGINT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
