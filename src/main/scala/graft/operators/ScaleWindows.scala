package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank arithmetic without unpartitioned corpus-sized windows — the shape
  * behind exact medians (q20/d142), exact AUC (d154/d177), and exact /
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
  */
object ScaleWindows {

  /** Per distinct value, the total weight strictly below it.
    *
    * @param distinct one row per distinct value (a groupBy(value) rollup)
    * @param valueCol integral value column (bands use floor division via
    *                 pmod, so negative values band correctly)
    * @param weightCol long weight per row (e.g. a count)
    * @param bandWidth fixed band width sizing the bounded global table
    * @return (valueCol, below) — below is a long
    */
  def bandedBelow(distinct: DataFrame, valueCol: String, weightCol: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val banded = distinct.withColumn("__band",
      expr(s"($valueCol - pmod($valueCol, $bandWidth)) DIV $bandWidth"))
    val wIn = Window.partitionBy(col("__band")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBands = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandTotals = banded.groupBy(col("__band"))
      .agg(sum(col(weightCol)).as("__bc"))
      .withColumn("__bb", coalesce(sum(col("__bc")).over(wBands), lit(0L)))
      .select(col("__band"), col("__bb"))
    banded
      .withColumn("__wb", coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
      .join(broadcast(bandTotals), "__band")
      .select(col(valueCol), (col("__bb") + col("__wb")).cast("long").as("below"))
  }
}
