package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window text chunking — the context-window stage that turns long
  * documents into overlapping `width`-char chunks every `stride` chars (the
  * retrieval/fine-tuning complement of [[SequencePacking]]). A pure narrow
  * map: per row, the chunk count is closed-form
  * (`max(0, len - (width - stride) - 1) div stride + 1` — one chunk per
  * stride start until the window covers the tail), then one posexplode over
  * the generated index range slices the text. Zero shuffle, pushdown- and
  * codegen-friendly; every doc is fully covered and chunks never exceed
  * `width` chars (the last one is short iff the text ends).
  */
object TextChunking {

  /** Returns `(id, chunk_idx, start, chunk_len, chunk)` — `start` 1-based,
    * consecutive starts `stride` apart, `chunk` the raw slice (hash or
    * embed it downstream). Requires `0 < stride <= width`.
    */
  def chunkFixed(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(stride > 0 && width >= stride, s"need 0 < stride <= width, got $stride/$width")
    val overlapPlusOne = width - stride + 1
    df
      .withColumn("__n",
        expr(s"greatest(0L, length($textCol) - ${overlapPlusOne}L) div ${stride}L") + 1L)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0L), col("__n") - 1L)).as(Seq("__p", "chunk_idx")))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride + 1L).as("start"),
        expr(s"substring($textCol, cast(chunk_idx * $stride + 1 as int), $width)")
          .as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("start"),
        length(col("chunk")).cast("long").as("chunk_len"), col("chunk"))
  }
}
