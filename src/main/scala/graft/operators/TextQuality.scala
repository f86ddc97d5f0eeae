package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public table-agnostic text-quality API — the Gopher/C4-style filters as
  * pure narrow maps over any text column, shared by the batch queries
  * (d38/d39) and their streaming twins. All rule arithmetic is
  * integer-exact (no float means cross engines or replays).
  */
object TextQuality {

  /** Adds repetition stats: `n_words`, `n_distinct_words`, `dup_word_frac`,
    * `n_bigrams`, `n_distinct_bigrams`, `dup_bigram_frac`. Bigrams come from
    * the codegen'd ngram kernel (repeats kept — the signal); fractions are
    * single IEEE divisions.
    */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val bg = graft.functions.prom.ngram_g(col(textCol), 2)
    df.withColumn("n_words", size(w).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(w)).cast("long"))
      .withColumn("dup_word_frac",
        (col("n_words") - col("n_distinct_words")).cast("double") /
          col("n_words").cast("double"))
      .withColumn("n_bigrams", size(bg).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(bg)).cast("long"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Default stopword floor lexicon (shared with d05 language-ID). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Adds the quality-rule inputs and verdict: `n_words`, `sum_word_len`,
    * `stop_hits`, `keep`. Rules: word-count bounds, mean-word-length band
    * as 3n <= sum_len <= 10n (integer-exact), stopword floor.
    */
  def withQualityRules(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = Stopwords, minStopHits: Int = 2): DataFrame = {
    val w = split(col(textCol), " ")
    df.withColumn("n_words", size(w).cast("long"))
      .withColumn("sum_word_len",
        aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("long"))
      .withColumn("stop_hits", size(array_intersect(array_distinct(w),
        array(stopwords.map(lit): _*))).cast("long"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("n_words") * 3 <= col("sum_word_len") &&
          col("sum_word_len") <= col("n_words") * 10 &&
          col("stop_hits") >= minStopHits)
  }

  /** Per-language stopword lexicons for the cheap language-ID classifier
    * (shared by the d05/d120 batch queries and the streaming router).
    */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  /** Adds the language-ID classifier columns: per-language distinct
    * stopword hit counts (`h_en`, `h_de`, `h_es`, `h_fr`) and the argmax
    * `pred` with the fixed en > de > es > fr tie order — ONE narrow map,
    * zero shuffle, identical on a batch corpus and a stream (the
    * batch/stream-twin contract every TextQuality map keeps).
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val tok = array_distinct(split(col(textCol), " "))
    def hits(words: Seq[String]) =
      size(array_intersect(tok, array(words.map(lit): _*))).cast("long")
    val h = LangLexicons.map { case (l, ws) => l -> hits(ws) }.toMap
    df.withColumn("h_en", h("en")).withColumn("h_de", h("de"))
      .withColumn("h_es", h("es")).withColumn("h_fr", h("fr"))
      .withColumn("pred",
        when(col("h_en") >= col("h_de") && col("h_en") >= col("h_es")
          && col("h_en") >= col("h_fr"), "en")
          .when(col("h_de") >= col("h_es") && col("h_de") >= col("h_fr"), "de")
          .when(col("h_es") >= col("h_fr"), "es")
          .otherwise("fr"))
  }

  /** First-failing-rule attribution for the composed filter cascade — the
    * [[withQualityRules]] gates in their deployed order plus the Gopher
    * repetition gate (dup-word fraction > 25% as the integer predicate
    * 4·(n_words − n_distinct) > n_words). Adds `rule_order` (1..4 = first
    * failed rule, 5 = pass) and `first_fail`. A pure narrow map like every
    * TextQuality stage (zero shuffle, batch/stream-twin contract held), so
    * the waterfall rollup downstream is the only exchange at any corpus
    * size. This is the kill-attribution read pipeline reports publish
    * (which rule removes what), as opposed to d112's leave-one-out
    * ablation (what each rule removes that no other rule would).
    */
  val WaterfallRules: Seq[String] =
    Seq("r1_word_count", "r2_word_len", "r3_stopword", "r4_repetition", "pass")

  def withFilterWaterfall(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = Stopwords, minStopHits: Int = 2): DataFrame =
    withQualityRules(df, textCol, minWords, maxWords, stopwords, minStopHits)
      .withColumn("n_distinct_words",
        size(array_distinct(split(col(textCol), " "))).cast("long"))
      // per-rule UNCONDITIONAL fail flags — the single source of truth for
      // the thresholds: rule_order/first_fail here and the d163/d175
      // contingency analyses all derive from these columns, so a threshold
      // change can never silently diverge the cascade from its analyses
      .withColumn("f1", col("n_words") < minWords || col("n_words") > maxWords)
      .withColumn("f2", col("n_words") * 3 > col("sum_word_len") ||
        col("sum_word_len") > col("n_words") * 10)
      .withColumn("f3", col("stop_hits") < minStopHits)
      .withColumn("f4", (col("n_words") - col("n_distinct_words")) * 4 > col("n_words"))
      .withColumn("rule_order",
        when(col("f1"), 1L).when(col("f2"), 2L).when(col("f3"), 3L)
          .when(col("f4"), 4L).otherwise(5L))
      .withColumn("first_fail",
        element_at(array(WaterfallRules.map(lit): _*), col("rule_order").cast("int")))
}
