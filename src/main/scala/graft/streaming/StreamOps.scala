package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analogs of the batch north-star operators.
  *
  * These are thin, deliberately declarative wrappers: watermark + built-in
  * stateful operators, so Spark manages state stores, spill, and recovery.
  * At scale the state is partitioned by the grouping key across executors —
  * the same shuffle key the batch versions use.
  */
object StreamOps {

  /** Streaming exact deduplication: drops rows whose `keys` repeat within the
    * watermark horizon (the streaming twin of d01 exact dedup; e.g. key =
    * series_key + timestamp for remote_write samples re-delivered by
    * at-least-once sources).
    */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Event-time tumbling-window counts+sums per key with late-data bound
    * `delay` (the streaming twin of q11). Append-mode emission happens when
    * the watermark passes the window end.
    */
  def tumblingAgg(df: DataFrame, eventTimeCol: String, delay: String,
      width: String, key: String, valueCol: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), width).as("w"), col(key))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("v"))
      .select(col("w.start").as("w_start"), col(key), col("n"), col("v"))

  /** Gap-based session windows per key with watermarked state eviction (the
    * streaming twin of q17). A session closes — and emits, in append mode —
    * once the watermark passes its end.
    */
  def sessionAgg(df: DataFrame, eventTimeCol: String, delay: String,
      gap: String, key: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(session_window(col(eventTimeCol), gap).as("w"), col(key))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"), col(key), col("n"))
}
