package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Rank arithmetic without unpartitioned corpus-sized windows — the shape
  * behind exact medians (q20/q41/d142), exact AUC (d154/d177), and exact /
  * tie-averaged Spearman ranks (d155/d178).
  *
  * A naive below-count (`sum(w) OVER (ORDER BY value ROWS UNBOUNDED
  * PRECEDING .. -1)`) forces the whole distinct-value table through ONE
  * partition — fine when the value domain is tiny, the textbook
  * scale-killer when distinct values track the corpus (near-unique scores).
  * [[bandedBelow]] splits the cumulation two-level: a fixed-width BAND
  * table takes the only global cumulative window (bounded by value-range /
  * bandWidth — d140's argument: range-bounded, not corpus-bounded), and
  * the within-band cumulation is a window PARTITIONED by band. Exact same
  * integers, no single-partition sort of anything corpus-sized.
  *
  * Two generalizations on top of that base shape:
  *
  *   - '''Partition columns''' ([[bandedBelowBy]]): per-GROUP below-counts
  *     (exact per-group order statistics — q20/q41/q44's l_returnflag).
  *     The within-band window partitions by (group, band); the band-total
  *     cumulation partitions by group. A window partitioned by a
  *     constant-domain group key over CORPUS rows would put ~corpus/|groups|
  *     in one task — partitioning the same window over the (group, distinct
  *     value) COUNT table keeps every sort bounded by the value domain.
  *   - '''Multi-level banding''' (`levels` ≥ 2): when the value range itself
  *     is unbounded (frequency-scaled scores — d155/d178's sb grows with the
  *     largest bigram count), the band table tracks max-value/bandWidth, so
  *     its cumulation is banded AGAIN. Each extra level divides the table
  *     that sees a global window by another factor of bandWidth; two 1e7
  *     levels bound any Long domain at ≤ ~9.2e4 terminal rows. Only the
  *     terminal (provably bounded) band table is force-broadcast; the
  *     intermediate band tables join plainly and AQE picks the strategy —
  *     forcing a broadcast of a corpus-tracking table is the banned shape.
  */
object ScaleWindows {

  /** Per distinct value, the total weight strictly below it.
    *
    * @param distinct one row per distinct value (a groupBy(value) rollup)
    * @param valueCol numeric value column; integral types band by exact
    *                 floor division (negatives band correctly), fractional
    *                 types by floor(value / bandWidth)
    * @param weightCol long weight per row (e.g. a count)
    * @param bandWidth fixed band width sizing the bounded global table
    * @param levels banding levels (default 1). Use 2 when the value range
    *               tracks the corpus (e.g. frequency-derived scores), so no
    *               global window ever runs over an unbounded table.
    * @return (valueCol, below) — below is a long
    */
  def bandedBelow(distinct: DataFrame, valueCol: String, weightCol: String,
      bandWidth: Long, levels: Int = 1): DataFrame =
    bandedBelowBy(distinct, Nil, valueCol, weightCol, bandWidth, levels)

  /** [[bandedBelow]] per group: below-counts are computed independently
    * within each combination of `partCols`. Returns
    * (partCols*, valueCol, below).
    */
  def bandedBelowBy(distinct: DataFrame, partCols: Seq[String],
      valueCol: String, weightCol: String, bandWidth: Long,
      levels: Int = 1): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(levels >= 1 && levels <= 3, s"levels must be 1..3, got $levels")
    val pc = partCols.map(col)
    val isIntegral = distinct.schema(valueCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val bandExpr: Column =
      if (isIntegral) expr(s"(`$valueCol` - pmod(`$valueCol`, $bandWidth)) DIV $bandWidth")
      else floor(col(valueCol) / lit(bandWidth.toDouble)).cast("long")
    val banded = distinct.withColumn("__band", bandExpr)
    val wIn = Window.partitionBy(pc :+ col("__band"): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandTotals = banded.groupBy(pc :+ col("__band"): _*)
      .agg(sum(col(weightCol)).as("__bc"))
    val bandBelow: DataFrame =
      if (levels <= 1) {
        // terminal level: the band table is bounded (by range/bandWidth, or
        // by the caller's multi-level contraction) — one global-per-group
        // cumulative window, and the result is safe to force-broadcast
        val wBands = Window.partitionBy(pc: _*).orderBy(col("__band"))
          .rowsBetween(Window.unboundedPreceding, -1)
        broadcast(bandTotals
          .withColumn("__bb", coalesce(sum(col("__bc")).over(wBands), lit(0L)))
          .select(pc :+ col("__band") :+ col("__bb"): _*))
      } else {
        // recurse: the band table may still track the corpus, so ITS
        // cumulation is banded again; no forced broadcast at this level
        bandedBelowBy(bandTotals.withColumnRenamed("__band", "__bv"),
            partCols, "__bv", "__bc", bandWidth, levels - 1)
          .select(pc :+ col("__bv").as("__band") :+ col("below").as("__bb"): _*)
      }
    banded
      .withColumn("__wb", coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
      .join(bandBelow, partCols :+ "__band")
      .select(pc :+ col(valueCol) :+
        (col("__bb") + col("__wb")).cast("long").as("below"): _*)
  }

  /** Exact per-group value-at-rank table from a (group, distinct value)
    * count rollup — the building block for exact medians/quartiles without
    * a corpus-per-task window sort (q20/q41/q13's shape, d142's integers).
    *
    * Returns the count table extended with `below` (weight strictly below
    * the value within its group, banded per [[bandedBelowBy]]), `cum`
    * (= below + cnt: the highest rank this distinct value covers) and `n`
    * (group total). The value at rank r is then
    * `min(when(cum >= r, value))` — an ordinary aggregate, no row ranking.
    */
  def rankTable(counts: DataFrame, partCols: Seq[String], valueCol: String,
      cntCol: String, bandWidth: Long, levels: Int = 1): DataFrame = {
    val pc = partCols.map(col)
    // the count table feeds THREE consumers (below-counts, group totals,
    // the final join): materialize it once so the corpus rollup behind it
    // runs once, not three times (blocks drain via Caches.release)
    val cnts = graft.sources.Caches.ephemeral(counts)
    val below = bandedBelowBy(cnts, partCols, valueCol, cntCol, bandWidth, levels)
    val totals = cnts.groupBy(pc: _*).agg(sum(col(cntCol)).as("n"))
    val withBelow = cnts
      .join(below, partCols :+ valueCol)
      .withColumn("cum", col("below") + col(cntCol))
    if (partCols.isEmpty) withBelow.crossJoin(broadcast(totals))
    else withBelow.join(broadcast(totals), partCols)
  }
}
