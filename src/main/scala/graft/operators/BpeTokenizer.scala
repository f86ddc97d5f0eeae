package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public BPE ENCODE surface — the apply side of the d76 training loop
  * (Sennrich et al., "Neural Machine Translation of Rare Words with Subword
  * Units"): given a trained merge list, turn text into its post-merge token
  * stream and then into dense token-id arrays, the form a sequence-packing
  * stage ([[SequencePacking]]) and a training-data writer consume. Closes
  * train (d76) -> encode (here) -> pack (d42-d47).
  *
  * Scale shape: encoding is one codegen'd kernel pass per document
  * (`prom.apply_merges` — no per-merge corpus scans, no joins); the merge
  * list is a tiny broadcast literal (vocab-bounded, collected once by the
  * trainer's driver loop). Id assignment shuffles only (token, count)
  * rollup rows: the vocabulary table is corpus-derived but VOCABULARY-sized,
  * so its one global rank window is the d74/d76 bounded-driver-loop
  * discipline applied to a window instead of a collect.
  */
object BpeTokenizer {

  /** Encode `textCol` under `merges` (entries `"a b"`, training order).
    * Output: `(idCol, tokens array<string>, n_tok)` — one row per input
    * row; token order is document order.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame = {
    val m = array(merges.map(lit): _*)
    docs.select(col(idCol),
        graft.functions.prom.apply_merges(col(textCol), m).as("tokens"))
      .withColumn("n_tok", size(col("tokens")).cast("long"))
  }

  /** Dense token-id vocabulary over an [[encode]] result: one row per
    * distinct post-merge token with `tid` = its 1-based rank in lexical
    * order (deterministic across engines and partitionings). The rank
    * window is global but runs on the VOCAB table, never the corpus.
    */
  def vocabulary(encoded: DataFrame): DataFrame = {
    val v = encoded.select(explode(col("tokens")).as("token")).distinct()
    v.withColumn("tid",
      row_number().over(Window.orderBy(col("token"))).cast("long"))
  }

  /** Train a WordPiece-style lexicon: every distinct single character of
    * the corpus's words (so greedy matching can never strand a position)
    * plus the `topK` most frequent multi-character substrings of length
    * 2..`maxPieceLen` (ties by piece, the corpus-count analog of d70's
    * first-merge rule). Substring fan-out is a narrow per-word transform;
    * the count rollup is two-phase; the top-K is a bounded TakeOrdered
    * (the d74 prune discipline) — the returned Seq is lexicon-sized and
    * sorted, ready to broadcast as the [[wordpieceEncode]] literal.
    */
  def wordpieceLexicon(docs: DataFrame, textCol: String,
      topK: Int = 32, maxPieceLen: Int = 4): Seq[String] = {
    val words = docs
      .select(explode(expr(s"filter(split($textCol, ' '), x -> length(x) >= 1)")).as("w"))
    val chars = words
      .select(explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("p"))
      .distinct()
    val multi = words
      .select(explode(flatten(array((2 to maxPieceLen).map(l => expr(
        s"CASE WHEN length(w) >= $l THEN transform(sequence(1, length(w) - $l + 1), i -> substring(w, i, $l)) ELSE array() END")): _*)))
        .as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p")).limit(topK)
      .select(col("p"))
    chars.union(multi).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }

  /** Encode `textCol` by greedy longest-match against `lexicon` (one
    * codegen'd kernel pass per row — the WordPiece apply half, beside the
    * BPE [[encode]]). Output: `(idCol, tokens array<string>, n_tok)`.
    */
  def wordpieceEncode(docs: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[String]): DataFrame = {
    val lex = array(lexicon.map(lit): _*)
    docs.select(col(idCol),
        graft.functions.prom.wordpiece(col(textCol), lex).as("tokens"))
      .withColumn("n_tok", size(col("tokens")).cast("long"))
  }

  /** The [[vocabulary]] table collected to a driver map — VOCABULARY-sized
    * by construction (the d74/Heaps'-law bound: prune or cap upstream if a
    * corpus's raw vocab outgrows driver memory), for stream-side literal
    * id resolution ([[graft.streaming.StreamOps.encodeBpe]]).
    */
  def vocabularyMap(vocab: DataFrame): Map[String, Long] =
    vocab.select(col("token"), col("tid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Token-id arrays: each document's `tokens` mapped through `vocab`
    * (an id table shaped like [[vocabulary]]'s output). Unknown tokens —
    * possible when the vocab was built on a different corpus — map to 0L
    * (the reserved unk id; ranks start at 1). Output:
    * `(idCol, n_tok, ids array<long>)`.
    *
    * The per-token join shuffles (doc, pos, token) rows against the
    * vocab-sized id table (AQE broadcasts it when it fits); reassembly is
    * one sorted collect bounded by document length.
    */
  def withTokenIds(encoded: DataFrame, idCol: String,
      vocab: DataFrame): DataFrame = {
    val pos = encoded.select(col(idCol).as("__id"), col("n_tok"),
      posexplode(col("tokens")).as(Seq("__p", "token")))
    pos.join(vocab, Seq("token"), "left")
      .groupBy(col("__id"), col("n_tok"))
      .agg(transform(
        array_sort(collect_list(struct(col("__p"),
          coalesce(col("tid"), lit(0L)).as("tid")))),
        x => x.getField("tid")).as("ids"))
      .select(col("__id").as(idCol), col("n_tok"), col("ids"))
  }

  /** [[withTokenIds]] with the vocabulary as a driver-collected literal map
    * (the [[vocabularyMap]] shape the streaming encoder already commits to):
    * ids come from one NARROW `transform` per row — no token posexplode, no
    * shuffle join against the id table, no per-doc collect_list/array_sort
    * reassembly (r22, guide §2.4 "remove shuffles outright": the old path
    * exchanged every token row twice to reassemble an order the tokens
    * array already had). Row-for-row identical to [[withTokenIds]]: ids in
    * document order, unknown tokens map to 0L, and rows whose token array
    * is empty are dropped (the join path loses them at the posexplode — the
    * filter keeps that contract). Vocabulary-sized literal by the same
    * Heaps'-law bound [[vocabularyMap]] states.
    */
  def withTokenIdsLit(encoded: DataFrame, idCol: String,
      vocab: Map[String, Long]): DataFrame = {
    val m = typedlit(vocab)
    encoded.filter(size(col("tokens")) > 0)
      .select(col(idCol), col("n_tok"),
        transform(col("tokens"),
          t => coalesce(element_at(m, t), lit(0L))).as("ids"))
  }
}
