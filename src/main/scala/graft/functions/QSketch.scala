package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch with ENGINE-EXACT state — the sketch-trio
  * sibling of [[CountMin]] (q47/q48) and [[Hll]] (q49–q52): q13 audits
  * Spark's built-in `percentile_approx`, whose KLL-style internals are
  * private; this is a quantile sketch whose state table itself crosses a
  * SQL oracle hash-exactly and merges like any aggregate.
  *
  * Design: log-linear value buckets — the DDSketch family's shape
  * (Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB'19) with the log-gamma
  * bucket map replaced by EXACT base-2 bit arithmetic so both engines
  * agree to the bit (a float log at a bucket boundary can round
  * differently across libm implementations; bit length cannot). For a
  * positive long v with
  * bit length L = length(bin(v)) and shift s = max(L - 1 - [[SubBits]], 0),
  * the bucket is [lo, lo + 2^s - 1] with lo = (v >> s) << s — i.e. v's
  * top SubBits+1 bits kept, the rest zeroed. Values below 2^(SubBits+1)
  * get exact singleton buckets (s = 0); above, each octave splits into
  * 2^SubBits sub-buckets, so the relative bucket width is at most
  * 2^-SubBits (the top kept bits are >= 2^SubBits). The bucket count is
  * bounded by ~(63 - SubBits) * 2^SubBits + 2^(SubBits+1) (~1.9k at
  * SubBits = 5) REGARDLESS of corpus size, and state rows are plain
  * (bucket_lo, count) longs:
  *
  *   - mergeable by ADDING counts (shards, windows, triggers — the
  *     streaming twin `StreamOps.qsketch` is the same groupBy per
  *     window);
  *   - oracle-exact: bit length via the `bin()`/`length` parity the HLL
  *     family proved cross-engine, shifts are integer ops.
  *
  * The quantile read walks the cumulative counts of the ordered bucket
  * table (a bounded-table window, never a corpus sort) and returns the
  * bucket [lo, hi] containing the target rank, with the containment
  * GUARANTEE exact-by-construction: rank(v < lo) < target <= rank(v <= hi)
  * and hi/lo <= 1 + 2^-SubBits. q54 audits the containment against the
  * raw corpus with two conditional counts — no sort, no corpus window.
  */
object QSketch {

  /** Sub-octave resolution bits: 2^5 = 32 buckets per octave, relative
    * bucket width (and thus quantile relative error) at most 2^-5 ≈ 3.1%.
    */
  val SubBits: Int = 5

  /** The bucket's lower edge for a POSITIVE long value: top SubBits+1
    * bits kept, the rest zeroed (exact integer arithmetic — bit length by
    * the bin()/length parity, variable shifts). Non-positive values raise
    * in-plan: a log-scaled bucket has no place for them, and silently
    * folding them into bucket 0 would corrupt low quantiles — recode or
    * filter upstream.
    */
  def bucketLo(v: Column): Column = {
    val checked = when(v <= 0L, raise_error(concat(
        lit("QSketch requires positive values, got "), v.cast("string"))))
      .otherwise(v)
    posLo(checked)
  }

  /** [[bucketLo]] without the positivity gate — shared by the signed
    * variant, which routes only magnitudes (> 0) here.
    */
  private def posLo(v: Column): Column = {
    val s = greatest(length(bin(v)).cast("int") - lit(1 + SubBits), lit(0))
    call_function("shiftleft", call_function("shiftright", v, s), s)
  }

  /** The bucket's upper edge from its lower edge: lo + 2^s - 1, where the
    * shift is recoverable from lo's own bit length (lo keeps exactly
    * SubBits+1 significant bits above the zeroed tail).
    */
  def bucketHi(lo: Column): Column = lo + posWidth(lo) - lit(1L)

  private def posWidth(lo: Column): Column = {
    val s = greatest(length(bin(lo)).cast("int") - lit(1 + SubBits), lit(0))
    call_function("shiftleft", lit(1L), s)
  }

  /** SIGNED bucket key — the full-axis variant for values that can be
    * negative or zero (account deltas, score diffs): positives keep
    * [[bucketLo]] as the key, zero is its own singleton bucket with key
    * 0, and a negative v takes key -bucketLo(-v) — the MIRRORED bucket's
    * upper edge, so keys sort in VALUE order across the whole axis
    * (bucket [-103, -100] has key -100 < key -96 of [-99, -96] < 0 <
    * 96 of [96, 99]) and the cumulative quantile walk needs no
    * sign-special-casing. The relative-width guarantee holds per
    * magnitude: |hi - lo| / |v| <= 2^-SubBits for |v| >= 2^(SubBits+1),
    * exact singletons below (and at zero).
    *
    * Domain edge: Long.MinValue has no positive magnitude (-v wraps) —
    * values scaled from doubles (the cents pattern) cannot reach it, but
    * a caller feeding raw ids should know |v| <= Long.MaxValue is the
    * contract (the SQL-oracle abs() errors on the same input, so the two
    * engines refuse together rather than diverge).
    */
  def bucketKeySigned(v: Column): Column =
    when(v > 0L, posLo(v))
      .when(v === 0L, lit(0L))
      .otherwise(-posLo(-v))

  /** The signed bucket's [low, high] edges from its key. */
  def edgesSigned(key: Column): (Column, Column) = {
    val lo = when(key > 0L, key)
      .when(key === 0L, lit(0L))
      .otherwise(-bucketHi(-key))
    val hi = when(key > 0L, bucketHi(key))
      .when(key === 0L, lit(0L))
      .otherwise(key)
    (lo, hi)
  }

  /** [[sketch]] over a signed long column: one row per touched signed
    * bucket, (bucket_key, cnt), same one-aggregation shape and the same
    * add-counts merge law.
    */
  def sketchSigned(df: DataFrame, valueCol: String): DataFrame =
    df.select(bucketKeySigned(col(valueCol)).as("bucket_key"))
      .groupBy("bucket_key").agg(count(lit(1)).as("cnt"))

  /** [[quantileReads]] over a signed state: identical cumulative walk
    * (keys already sort in value order), edges from [[edgesSigned]].
    */
  def quantileReadsSigned(state: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got ${qs.mkString(", ")}")
    val spark = state.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket_key")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = state.agg(sum(col("cnt")).as("n")) // one row
    val qdf = qs.toDF("q")
    val (loE, hiE) = edgesSigned(col("key"))
    state.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot)) // one-row stat broadcast (bounded)
      .crossJoin(broadcast(qdf)) // |qs| rows (bounded)
      .withColumn("target",
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
      .filter(col("cum") >= col("target"))
      .groupBy("q", "target").agg(min(col("bucket_key")).as("key"))
      .select(col("q"), loE.as("lo"), hiE.as("hi"), col("target"))
  }

  /** The bounded sketch state of `df`'s positive long column `valueCol`:
    * one row per touched bucket, (bucket_lo, cnt). One hash aggregation
    * with map-side partials; merge two states by unioning and summing
    * counts per bucket.
    */
  def sketch(df: DataFrame, valueCol: String): DataFrame =
    df.select(bucketLo(col(valueCol)).as("bucket_lo"))
      .groupBy("bucket_lo").agg(count(lit(1)).as("cnt"))

  /** The quantile read over a sketch state: for each q in `qs`, the
    * bucket [lo, hi] containing the rank-ceil(q*n) value, plus the target
    * rank itself. The cumulative walk is ONE window over the bounded
    * bucket table (<= ~1.9k rows at SubBits = 5 — never the corpus) and
    * the quantile fan-out is a broadcast of |qs| rows.
    */
  def quantileReads(state: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got ${qs.mkString(", ")}")
    val spark = state.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket_lo")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = state.agg(sum(col("cnt")).as("n")) // one row
    val qdf = qs.toDF("q")
    state.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot)) // one-row stat broadcast (bounded)
      .crossJoin(broadcast(qdf)) // |qs| rows (bounded)
      .withColumn("target",
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
      .filter(col("cum") >= col("target"))
      .groupBy("q", "target").agg(min(col("bucket_lo")).as("lo"))
      .select(col("q"), col("lo"), bucketHi(col("lo")).as("hi"), col("target"))
  }
}
