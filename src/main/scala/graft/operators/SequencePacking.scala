package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data stage that turns per-document token
  * counts into fixed-length training sequences. Two public shapes:
  *
  *   - [[packChunked]]: concatenate each shard's documents (doc_id order)
  *     into one token stream and cut it every `seqLen` tokens — documents
  *     MAY span a boundary (the GPT-style pretraining layout, zero padding
  *     waste). Per doc: the global first/last sequence it lands in and its
  *     offset in the first one.
  *   - [[packGreedy]]: greedy next-fit bin packing — a document never
  *     splits; a sequence closes when the next document doesn't fit
  *     (oversized documents get a sequence of their own). Per doc: its
  *     global sequence id.
  *
  * Scale design: documents are sharded by `id % shards`, so every windowed
  * cumulative sum / fold is per-shard (bounded partitions — never a corpus-
  * wide sort), and the only cross-shard step is the sequence-id prefix-sum
  * over the `shards`-row per-shard totals table (a single-partition window
  * over a bounded input, then broadcast back). No driver-side collect
  * anywhere. Choose `shards` so one shard's (id, count) pairs fit a reducer
  * (16 bytes/doc — millions of docs per shard are fine); global sequence
  * ids stay dense 0..N-1 across shards for any choice.
  *
  * Everything is integer arithmetic on deterministic inputs, so results are
  * engine-exact (DuckDB-oracle-checked via d42/d43).
  */
object SequencePacking {

  /** The shards-row prefix-sum turning per-shard sequence counts into
    * global base offsets (a single-partition window over `shards` rows,
    * never data).
    */
  private val BaseWindow = Window.orderBy("shard")
    .rowsBetween(Window.unboundedPreceding, -1)

  /** Rows with `n_tok <= 0` are dropped: a zero-token document occupies no
    * sequence positions, and keeping it would make packChunked emit a
    * nonsensical `last_seq < first_seq` row.
    */
  private def sharded(df: DataFrame, idCol: String, countCol: String,
      shards: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), col(countCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0L)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))

  /** Contiguous concat-and-chunk packing. Returns
    * `(doc_id, n_tok, shard, first_seq, last_seq, seq_off)` with sequence
    * ids global across shards and `seq_off` the document's start offset
    * inside `first_seq` (in `[0, seqLen)`).
    */
  def packChunked(df: DataFrame, idCol: String, countCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, s"seqLen/shards must be positive")
    val s = sharded(df, idCol, countCol, shards)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val cum = s.withColumn("cum", sum(col("n_tok")).over(w))
    // per-shard totals come from a plain scan-aggregate (map-side partials
    // to `shards` rows — no second corpus window/shuffle on this branch)
    val bases = s.groupBy(col("shard")).agg(sum(col("n_tok")).as("tok"))
      .select(col("shard"), expr(s"(tok + ${seqLen - 1}) div $seqLen").as("nseq"))
      .withColumn("base", coalesce(sum(col("nseq")).over(BaseWindow), lit(0L)))
      .select(col("shard"), col("base"))
    cum.join(broadcast(bases), "shard")
      .select(col("doc_id"), col("n_tok"), col("shard"),
        (col("base") + expr(s"(cum - n_tok) div $seqLen")).as("first_seq"),
        (col("base") + expr(s"(cum - 1) div $seqLen")).as("last_seq"),
        ((col("cum") - col("n_tok")) % seqLen).as("seq_off"))
  }

  /** Greedy next-fit packing (documents never split). Returns
    * `(doc_id, n_tok, shard, seq)` with `seq` global across shards. The
    * per-shard fold runs in one reducer over the shard's sorted
    * (doc_id, n_tok) array — the documented shard-size knob above.
    *
    * @param maxDocsPerSeq cap on documents per sequence (the attention-mask
    *                      constraint: a sequence closes after k docs even if
    *                      more would fit). 0 = unbounded.
    */
  def packGreedy(df: DataFrame, idCol: String, countCol: String,
      seqLen: Int, shards: Int, maxDocsPerSeq: Int = 0): DataFrame = {
    require(seqLen > 0 && shards > 0, s"seqLen/shards must be positive")
    val grouped = sharded(df, idCol, countCol, shards)
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_tok")))).as("ds"))
    // next-fit state machine over the doc_id-ordered counts: one codegen'd
    // O(n) kernel pass per shard (prom.next_fit_bins) emitting each doc's
    // bin. The first doc always opens bin 0; an oversized doc opens its own
    // bin (fill > seqLen closes it on the next doc).
    val folded = grouped.withColumn("bins",
      graft.functions.prom.next_fit_bins(
        transform(col("ds"), d => d.getField("n_tok")), seqLen, maxDocsPerSeq))
    // the folded frame is one row per shard, so the global-id prefix-sum is
    // a window over it directly — attached BEFORE the explode, one fold
    // total, no join, no second pass over the corpus
    folded
      .withColumn("nseq", array_max(col("bins")) + 1L)
      .withColumn("base", coalesce(sum(col("nseq")).over(BaseWindow), lit(0L)))
      .select(col("shard"), col("base"),
        posexplode(arrays_zip(col("ds"), col("bins"))).as(Seq("i", "z")))
      .select(col("z.ds.doc_id").as("doc_id"), col("z.ds.n_tok").as("n_tok"),
        col("shard"), (col("base") + col("z.bins")).as("seq"))
  }
}
