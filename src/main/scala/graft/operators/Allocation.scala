package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public budget-allocation arithmetic over a keyed weight/availability
  * table — the d107/d108 shapes for any DataFrame. Both rules are
  * integer-exact (no float shares that round differently across engines)
  * and reduce the input to its |keys|-row aggregate FIRST; every window
  * and division then runs on the bounded table, so the shapes hold at any
  * corpus size.
  */
object Allocation {

  /** Hamilton largest-remainder apportionment: split an integer `budget`
    * across keys proportionally to `weightCol`, floors first, then one
    * extra unit to the largest remainders (ties by key) — the allocation
    * that provably sums EXACTLY to the budget, which per-key proportional
    * rounding does not. Input must already be one row per key.
    *
    * Returns `(keyCol, weightCol, base_alloc, alloc)`.
    */
  def apportion(weights: DataFrame, keyCol: String, weightCol: String,
      budget: Long): DataFrame = {
    // |keys|-row table persisted: the total, quota and remainder-rank
    // branches all reuse it
    val t = weights.select(col(keyCol), col(weightCol).cast("long")).transform(graft.sources.Caches.ephemeral)
    val tot = t.agg(sum(col(weightCol)).as("__T"))
    // the budget x weight product runs in DECIMAL(38,0): with token-mass
    // weights (~1e13 at 100 TB) and a comparable budget the Long product
    // would silently wrap (non-ANSI); 1e13 * 1e13 = 1e26 fits decimal38
    val base = t.crossJoin(broadcast(tot))
      .select(col(keyCol), col(weightCol),
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * $weightCol) DIV __T AS BIGINT)")
          .as("base_alloc"),
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * $weightCol) % __T AS BIGINT)")
          .as("__rem"))
    val leftover = base.agg((lit(budget) - sum(col("base_alloc"))).as("__leftover"))
    base.crossJoin(broadcast(leftover))
      .withColumn("__rr",
        row_number().over(Window.orderBy(col("__rem").desc, col(keyCol))))
      .select(col(keyCol), col(weightCol), col("base_alloc"),
        (col("base_alloc") +
          when(col("__rr") <= col("__leftover"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Closed-form water-filling: spread `budget` as evenly as the per-key
    * `availCol` caps allow. Keys that saturate (avail below the water
    * level) provably form a PREFIX of the availability order, so one
    * bounded window plus one one-row aggregate decide the level — no
    * iteration; the remainder goes largest-remainder-style to the first
    * unsaturated keys, levelling allocations within one unit.
    *
    * `budget` must be strictly less than the total availability (with
    * budget >= total every key would saturate and the level is undefined —
    * the caller should clamp). Input must already be one row per key.
    *
    * Returns `(keyCol, availCol, saturated, alloc)`.
    */
  def waterfill(avail: DataFrame, keyCol: String, availCol: String,
      budget: Long): DataFrame = {
    val t = avail.select(col(keyCol), col(availCol).cast("long")).transform(graft.sources.Caches.ephemeral)
    val tot = t.agg(sum(col(availCol)).as("__T"), count(lit(1)).as("__m"))
    val w = Window.orderBy(col(availCol), col(keyCol))
    val o = t.select(col(keyCol), col(availCol),
      row_number().over(w).cast("long").as("__k"),
      sum(col(availCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("__pk"))
    // avail x remaining-keys in DECIMAL(38,0): with 1e13-token caps and
    // 1e6 keys the Long product wraps (same failure mode as apportion's
    // budget x weight). Prefix sums themselves must fit in Long — callers
    // with > 9e18 total tokens pre-scale units.
    val st = o.crossJoin(broadcast(tot))
      .withColumn("saturated",
        expr(s"CAST($availCol AS DECIMAL(38,0)) * (__m - __k + 1)" +
          s" + (__pk - $availCol) <= $budget"))
    val lvl = st.agg(
      coalesce(max(when(col("saturated"), col("__k"))), lit(0L)).as("__kstar"),
      coalesce(max(when(col("saturated"), col("__pk"))), lit(0L)).as("__psat"),
      max(col("__m")).as("__m2"))
      .select(col("__kstar"),
        expr(s"($budget - __psat) div (__m2 - __kstar)").as("__base"),
        expr(s"($budget - __psat) % (__m2 - __kstar)").as("__extra"))
    st.crossJoin(broadcast(lvl))
      .select(col(keyCol), col(availCol), col("saturated"),
        when(col("saturated"), col(availCol))
          .otherwise(col("__base") +
            when(col("__k") - col("__kstar") <= col("__extra"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
