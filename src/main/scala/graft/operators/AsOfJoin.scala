package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the first right row at-or-after (forward)
  * or at-or-before (backward) the left row's time, per join key.
  *
  * Spark-first shape: equi-join on the keys with the time bound as a join
  * predicate, then `min(struct(time, tieBreak..., payload...))` /
  * `max(struct(...))` per left row — a partial aggregation that combines
  * map-side, so only ~one row per (left row, map partition) crosses the
  * exchange. No window operator, no per-key state: at 100 TB the only
  * shuffle is the join's own key exchange (see q16 for the oracle-checked
  * instance).
  *
  * Lexicographic struct ordering gives "earliest time, then tie-break
  * chain"; `tieBreak` must extend to a unique key for deterministic payloads.
  */
object AsOfJoin {

  /** @param left       left (probe) side, one output row per input row
    * @param right      right side to search
    * @param keys       equi-join key column names (same names both sides)
    * @param leftTime   left timestamp column
    * @param rightTime  right timestamp column
    * @param tieBreak   right columns completing a unique ordering
    * @param payload    right columns to carry into the result
    * @param forward    true = first right at-or-after; false = last at-or-before
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column, tieBreak: Seq[Column],
      payload: Seq[Column], forward: Boolean = true): DataFrame = {
    val cond = keys.map(k => left(k) === right(k)).reduce(_ && _) &&
      (if (forward) rightTime >= leftTime else rightTime <= leftTime)
    val ordered = struct((rightTime +: tieBreak ++: payload).distinct: _*)
    val leftCols = left.columns.map(left(_))
    val pick = if (forward) min(ordered) else max(ordered)
    left.join(right, cond)
      .groupBy(leftCols: _*)
      .agg(pick.as("asof"))
  }
}
