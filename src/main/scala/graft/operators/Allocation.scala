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
    val t = weights.select(col(keyCol), col(weightCol).cast("long")).persist()
    val tot = t.agg(sum(col(weightCol)).as("__T"))
    val base = t.crossJoin(broadcast(tot))
      .select(col(keyCol), col(weightCol),
        expr(s"($budget * $weightCol) div __T").as("base_alloc"),
        expr(s"($budget * $weightCol) % __T").as("__rem"))
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
    val t = avail.select(col(keyCol), col(availCol).cast("long")).persist()
    val tot = t.agg(sum(col(availCol)).as("__T"), count(lit(1)).as("__m"))
    val w = Window.orderBy(col(availCol), col(keyCol))
    val o = t.select(col(keyCol), col(availCol),
      row_number().over(w).cast("long").as("__k"),
      sum(col(availCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("__pk"))
    val st = o.crossJoin(broadcast(tot))
      .withColumn("saturated",
        col(availCol) * (col("__m") - col("__k") + 1) +
          (col("__pk") - col(availCol)) <= lit(budget))
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
