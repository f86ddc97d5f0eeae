package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch with ENGINE-EXACT registers — the
  * q13 `approx_count_distinct` (whose HLL++ internals are Spark-private)
  * re-expressed so the register table itself crosses the DuckDB oracle
  * hash-exactly and merges like any aggregate: a register's value is a MAX,
  * so per-shard/per-trigger partials combine register-wise (the classic
  * HLL merge), which is what makes the same table the streaming twin's
  * state (`StreamOps.hllSketch`: |windows| x <=256 rows, never keyed by
  * user).
  *
  * Hashing is the repo's oracle discipline (md5 chars 1-15 as a 60-bit
  * value — `conv`/`'0x'||substr` parity proven by the winnow family):
  * register = low 8 bits (m = 256), rho = leading-zero count of the
  * remaining 52 bits + 1, computed with exact integer ops only
  * (shiftright + `bin` length — both engines print minimal-width binary,
  * so rho = 53 - length(bin(w)) for w > 0, 53 for w = 0).
  *
  * m = 256 keeps the fixed state tiny and puts BOTH estimator regimes in
  * play at test scale: linear counting below 2.5m = 640 distincts (the
  * sf0.01 gate) and the raw harmonic estimate above it (sf0.1).
  */
object Hll {

  /** Register count (2^8). */
  val M: Int = 256

  /** alpha_m * m^2 for m = 256 (the standard bias constant
    * 0.7213 / (1 + 1.079/m)).
    */
  val AlphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble

  /** (register, rho) for one key — exact integer arithmetic, oracle form:
    * `v % 256` / `v // 256` with rho from the minimal-width binary length.
    */
  def regRho(key: Column): (Column, Column) = {
    val v = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val w = shiftright(v, 8)
    val rho = when(w === 0L, lit(53L))
      .otherwise(lit(53L) - length(bin(w)).cast("long"))
    ((v % M).cast("long"), rho)
  }

  /** The <=256-row register table of `df`'s `keyCol`: one row per TOUCHED
    * register with max(rho). Mergeable by register-wise max (union two
    * tables, groupBy register, max — the HLL merge); absent registers mean
    * rho = 0. One hash aggregation; fixed-size state at any corpus size.
    */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val (reg, rho) = regRho(col(keyCol))
    df.select(reg.as("register"), rho.as("rho"))
      .groupBy(col("register")).agg(max(col("rho")).as("rho"))
  }

  /** [[registers]] per GROUP — the production shape (distinct users per
    * dimension): one row per (group..., touched register), state
    * |groups| x <=256 rows, still one hash aggregation with map-side
    * partials and still max-mergeable per group across shards/windows
    * (the streaming twin's `w_start` is exactly this with the window as
    * the group).
    */
  def registersBy(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    require(!groupCols.contains("register") && !groupCols.contains("rho"),
      s"group columns ${groupCols.mkString(", ")} collide with the register schema")
    val (reg, rho) = regRho(col(keyCol))
    df.select(groupCols.map(col) ++ Seq(reg.as("register"), rho.as("rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** The per-group cardinality read over a [[registersBy]] table: the same
    * raw-harmonic / linear-counting switch as [[estimate]], one row per
    * group `(group..., est, n_registers, linear)`. Pure aggregation over
    * the bounded register table — never the corpus.
    */
  def estimateBy(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__present_sum"),
        count(lit(1)).as("n_registers"))
      .select(groupCols.map(col) ++ Seq(
        (col("__present_sum") + (lit(M.toLong) - col("n_registers"))).as("__s"),
        (lit(M.toLong) - col("n_registers")).cast("double").as("__v"),
        col("n_registers")): _*)
      .select(groupCols.map(col) ++ Seq(
        (lit(AlphaM2) / col("__s") <= lit(2.5 * M) && col("__v") > 0d).as("linear"),
        col("__s"), col("__v"), col("n_registers")): _*)
      .select(groupCols.map(col) ++ Seq(
        when(col("linear"),
            lit(M.toDouble) * log(lit(M.toDouble) / col("__v")))
          .otherwise(lit(AlphaM2) / col("__s")).as("est"),
        col("n_registers"), col("linear")): _*)

  /** The cardinality estimate read over a register table: the raw harmonic
    * estimate alpha_m m^2 / (sum 2^-rho + absent), switching to linear
    * counting m ln(m/V) when the raw estimate is below 2.5m and zero
    * registers exist (the standard small-range correction; V counts
    * absent registers — a touched register always has rho >= 1). Returns
    * one row `(est, n_registers, linear)`; float arithmetic stays in this
    * READ, never in the mergeable/oracle-crossing register table.
    *
    * Accuracy honesty: linear counting is ~1-2% at these loads; the CLASSIC
    * raw estimator this implements has standard error 1.04/sqrt(m) (6.5%
    * at m = 256) PLUS a known positive bias for cardinalities below ~10m —
    * the gap HLL++'s empirical interpolation table exists to correct (and
    * what Spark's private `approx_count_distinct` ships; q13 audits that
    * one). Consumers banding the estimate should band by regime — the
    * `linear` flag is emitted for exactly that (q50 uses 5% linear / 20%
    * raw, the latter ~3 sigma to cover bias + draw noise).
    */
  def estimate(registers: DataFrame): DataFrame =
    registers
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__present_sum"),
        count(lit(1)).as("n_registers"))
      .select(
        (col("__present_sum") + (lit(M.toLong) - col("n_registers"))).as("__s"),
        (lit(M.toLong) - col("n_registers")).cast("double").as("__v"),
        col("n_registers"))
      .select(
        (lit(AlphaM2) / col("__s") <= lit(2.5 * M) && col("__v") > 0d).as("linear"),
        col("__s"), col("__v"), col("n_registers"))
      .select(
        when(col("linear"),
            lit(M.toDouble) * log(lit(M.toDouble) / col("__v")))
          .otherwise(lit(AlphaM2) / col("__s")).as("est"),
        col("n_registers"), col("linear"))
}
