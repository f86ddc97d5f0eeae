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

  /** The published HLL++ linear-counting threshold for precision 8: use
    * linear counting when V > 0 and m ln(m/V) <= this (Heule, Nunkesser,
    * Hall, "HyperLogLog in Practice", EDBT'13, §5 / appendix — the same
    * constant Apache Spark ships in
    * org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
    * THRESHOLDS(p-4), verified against spark-catalyst 4.1.2).
    */
  val LinearThreshold: Double = 220.0

  /** The published bias-correction zone: the empirical correction applies
    * when the RAW estimate is at most 5m (beyond it the classic
    * estimator's bias is negligible and the table ends — RawEstimates.last
    * is 1274.5).
    */
  val CorrectionCap: Double = 5.0 * M

  /** The published empirical (raw estimate -> mean bias) table for
    * m = 256 (precision 8), 200 knots: Heule et al. EDBT'13 appendix
    * (rawEstimateData[4] / biasData[4]), byte-identical to the arrays in
    * Apache Spark's HyperLogLogPlusPlusHelper. The classic raw estimator
    * alpha_m m^2 / sum is biased HIGH below ~5m (up to +70% near n = m);
    * subtracting the interpolated mean bias removes it. Like
    * `Privacy.geometricThresholds`, the table lives driver-side and is
    * interpolated into BOTH the Spark plan and the SQL oracles as double
    * literals, so the corrected estimator is engine-exact by construction.
    */
  val RawEstimates: Vector[Double] = Vector(
    184.2152, 187.2454, 190.2096, 193.6652, 196.6312, 199.6822, 203.249,
    206.3296, 210.0038, 213.2074, 216.4612, 220.27, 223.5178, 227.4412,
    230.8032, 234.1634, 238.1688, 241.6074, 245.6946, 249.2664, 252.8228,
    257.0432, 260.6824, 264.9464, 268.6268, 272.2626, 276.8376, 280.4034,
    284.8956, 288.8522, 292.7638, 297.3552, 301.3556, 305.7526, 309.9292,
    313.8954, 318.8198, 322.7668, 327.298, 331.6688, 335.9466, 340.9746,
    345.1672, 349.3474, 354.3028, 358.8912, 364.114, 368.4646, 372.9744,
    378.4092, 382.6022, 387.843, 392.5684, 397.1652, 402.5426, 407.4152,
    412.5388, 417.3592, 422.1366, 427.486, 432.3918, 437.5076, 442.509,
    447.3834, 453.3498, 458.0668, 463.7346, 469.1228, 473.4528, 479.7,
    484.644, 491.0518, 495.5774, 500.9068, 506.432, 512.1666, 517.434,
    522.6644, 527.4894, 533.6312, 538.3804, 544.292, 550.5496, 556.0234,
    562.8206, 566.6146, 572.4188, 579.117, 583.6762, 590.6576, 595.7864,
    601.509, 607.5334, 612.9204, 619.772, 624.2924, 630.8654, 636.1836,
    642.745, 649.1316, 655.0386, 660.0136, 666.6342, 671.6196, 678.1866,
    684.4282, 689.3324, 695.4794, 702.5038, 708.129, 713.528, 720.3204,
    726.463, 732.7928, 739.123, 744.7418, 751.2192, 756.5102, 762.6066,
    769.0184, 775.2224, 781.4014, 787.7618, 794.1436, 798.6506, 805.6378,
    811.766, 819.7514, 824.5776, 828.7322, 837.8048, 843.6302, 849.9336,
    854.4798, 861.3388, 867.9894, 873.8196, 880.3136, 886.2308, 892.4588,
    899.0816, 905.4076, 912.0064, 917.3878, 923.619, 929.998, 937.3482,
    943.9506, 947.991, 955.1144, 962.203, 968.8222, 975.7324, 981.7826,
    988.7666, 994.2648, 1000.3128, 1007.4082, 1013.7536, 1020.3376,
    1026.7156, 1031.7478, 1037.4292, 1045.393, 1051.2278, 1058.3434,
    1062.8726, 1071.884, 1076.806, 1082.9176, 1089.1678, 1095.5032,
    1102.525, 1107.2264, 1115.315, 1120.93, 1127.252, 1134.1496, 1139.0408,
    1147.5448, 1153.3296, 1158.1974, 1166.5262, 1174.3328, 1175.657,
    1184.4222, 1190.9172, 1197.1292, 1204.4606, 1210.4578, 1218.8728,
    1225.3336, 1226.6592, 1236.5768, 1241.363, 1249.4074, 1254.6566,
    1260.8014, 1266.5454, 1274.5192)

  val Biases: Vector[Double] = Vector(
    183.2152, 180.2454, 177.2096, 173.6652, 170.6312, 167.6822, 164.249,
    161.3296, 158.0038, 155.2074, 152.4612, 149.27, 146.5178, 143.4412,
    140.8032, 138.1634, 135.1688, 132.6074, 129.6946, 127.2664, 124.8228,
    122.0432, 119.6824, 116.9464, 114.6268, 112.2626, 109.8376, 107.4034,
    104.8956, 102.8522, 100.7638, 98.3552, 96.3556, 93.7526, 91.9292,
    89.8954, 87.8198, 85.7668, 83.298, 81.6688, 79.9466, 77.9746, 76.1672,
    74.3474, 72.3028, 70.8912, 69.114, 67.4646, 65.9744, 64.4092, 62.6022,
    60.843, 59.5684, 58.1652, 56.5426, 55.4152, 53.5388, 52.3592, 51.1366,
    49.486, 48.3918, 46.5076, 45.509, 44.3834, 43.3498, 42.0668, 40.7346,
    40.1228, 38.4528, 37.7, 36.644, 36.0518, 34.5774, 33.9068, 32.432,
    32.1666, 30.434, 29.6644, 28.4894, 27.6312, 26.3804, 26.292,
    25.5496000000001, 25.0234, 24.8206, 22.6146, 22.4188, 22.117, 20.6762,
    20.6576, 19.7864, 19.509, 18.5334, 17.9204, 17.772, 16.2924, 16.8654,
    15.1836, 15.745, 15.1316, 15.0386, 14.0136, 13.6342, 12.6196, 12.1866,
    12.4281999999999, 11.3324, 10.4794000000001, 11.5038, 10.129,
    9.52800000000002, 10.3203999999999, 9.46299999999997, 9.79280000000006,
    9.12300000000005, 8.74180000000001, 9.2192, 7.51020000000005,
    7.60659999999996, 7.01840000000004, 7.22239999999999, 7.40139999999997,
    6.76179999999999, 7.14359999999999, 5.65060000000005, 5.63779999999997,
    5.76599999999996, 6.75139999999999, 5.57759999999996, 3.73220000000003,
    5.8048, 5.63019999999995, 4.93359999999996, 3.47979999999995,
    4.33879999999999, 3.98940000000005, 3.81960000000004, 3.31359999999995,
    3.23080000000004, 3.4588, 3.08159999999998, 3.4076, 3.00639999999999,
    2.38779999999997, 2.61900000000003, 1.99800000000005, 3.34820000000002,
    2.95060000000001, 0.990999999999985, 2.11440000000005, 2.20299999999997,
    2.82219999999995, 2.73239999999998, 2.7826, 3.76660000000004,
    2.26480000000004, 2.31280000000004, 2.40819999999997, 2.75360000000001,
    3.33759999999995, 2.71559999999999, 1.7478000000001, 1.42920000000004,
    2.39300000000003, 2.22779999999989, 2.34339999999997, 0.87259999999992,
    3.88400000000001, 1.80600000000004, 1.91759999999999, 1.16779999999994,
    1.50320000000011, 2.52500000000009, 0.226400000000012, 2.31500000000005,
    0.930000000000064, 1.25199999999995, 2.14959999999996,
    0.0407999999999902, 2.5447999999999, 1.32960000000003,
    0.197400000000016, 2.52620000000002, 3.33279999999991,
    -1.34300000000007, 0.422199999999975, 0.917200000000093,
    1.12920000000008, 1.46060000000011, 1.45779999999991, 2.8728000000001,
    3.33359999999993, -1.34079999999994, 1.57680000000005,
    0.363000000000056, 1.40740000000005, 0.656600000000026,
    0.801400000000058, -0.454600000000028, 1.51919999999996)

  /** Piecewise-linear slopes between adjacent table knots, computed ONCE
    * driver-side so the Spark when-chain and the SQL CASE chain multiply
    * the same double literal.
    */
  private lazy val Slopes: Vector[Double] =
    (1 until RawEstimates.size).map { i =>
      (Biases(i) - Biases(i - 1)) / (RawEstimates(i) - RawEstimates(i - 1))
    }.toVector

  /** The interpolated mean bias at raw estimate `e`: piecewise-linear
    * between the published knots, clamped to the end values outside the
    * table (below the first knot linear counting has already taken over;
    * above the last the zone cap is 3 knots away).
    *
    * Plan shape: the knots live as THREE array literals and the bracket
    * index is one `filter`+`size` over them — a handful of expression
    * nodes, where the equivalent 199-arm when-chain costs ~0.9 s of
    * Catalyst/codegen time PER RUN (measured on q50: 0.25 s -> 1.15 s).
    * The higher-order function is interpreted per row, but this read runs
    * over at most |groups| rows (never the corpus — the register
    * aggregation is the corpus pass), so the interpreted scan of 200
    * doubles is nanoseconds. The arithmetic — Biases(i-1) +
    * (e - RawEstimates(i-1)) * Slopes(i-1) at the first knot i with
    * e < RawEstimates(i) — is literal-for-literal the CASE chain
    * [[biasCaseSql]] emits for the oracle, so the engines stay exact.
    */
  def biasOf(e: Column): Column = {
    val reLit = lit(RawEstimates.toArray)
    val bLit = lit(Biases.toArray)
    val sLit = lit(Slopes.toArray)
    // i = number of knots <= e, i.e. the 1-based index of the LAST knot
    // at or below e; equals the when-chain's first-arm index because the
    // knots are strictly increasing
    val i = size(filter(reLit, x => x <= e))
    when(i === 0, lit(Biases.head))
      .when(i === RawEstimates.size, lit(Biases.last))
      .otherwise(element_at(bLit, i) +
        (e - element_at(reLit, i)) * element_at(sLit, i))
  }

  /** [[biasOf]] as a SQL CASE chain over the expression `e` — built from
    * the SAME driver-side knots/slopes (the `Privacy.geometricThresholds`
    * dpCase discipline), so both engines interpolate identical literals.
    */
  def biasCaseSql(e: String): String = {
    val arms = (s"WHEN $e < ${RawEstimates.head} THEN ${Biases.head}") +:
      (1 until RawEstimates.size).map { i =>
        s"WHEN $e < ${RawEstimates(i)} THEN ${Biases(i - 1)} + " +
          s"($e - ${RawEstimates(i - 1)}) * ${Slopes(i - 1)}"
      }
    s"CASE ${arms.mkString(" ")} ELSE ${Biases.last} END"
  }

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

  /** The shared HLL++ read over (ps = sum 2^-rho over TOUCHED registers,
    * nr = touched-register count), emitted as (est, regime) expressions:
    *
    *   V    = m - nr                      (absent registers)
    *   Eraw = alpha_m m^2 / (ps + V)      (classic raw estimate)
    *   H    = m ln(m/V)                   (linear counting; +Inf at V = 0,
    *                                       so the threshold compare is
    *                                       false without a special case)
    *   est  = H                 when V > 0 and H <= 220      ('linear')
    *          Eraw - bias(Eraw) when Eraw <= 5m              ('corrected')
    *          Eraw              otherwise                    ('raw')
    *
    * — the published HLL++ estimator (Heule et al. EDBT'13 §5) at p = 8,
    * with [[biasOf]]'s interpolation over the published table.
    */
  private def readExprs(ps: Column, nr: Column): (Column, Column) = {
    val v = (lit(M.toLong) - nr).cast("double")
    val eraw = lit(AlphaM2) / (ps + v)
    val h = lit(M.toDouble) * log(lit(M.toDouble) / v)
    val linear = v > 0d && h <= lit(LinearThreshold)
    val est = when(linear, h)
      .when(eraw <= lit(CorrectionCap), eraw - biasOf(eraw))
      .otherwise(eraw)
    val regime = when(linear, lit("linear"))
      .when(eraw <= lit(CorrectionCap), lit("corrected"))
      .otherwise(lit("raw"))
    (est, regime)
  }

  /** The per-group cardinality read over a [[registersBy]] table: the same
    * linear / bias-corrected / raw switch as [[estimate]], one row per
    * group `(group..., est, n_registers, regime)`. Pure aggregation over
    * the bounded register table — never the corpus.
    */
  def estimateBy(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val (est, regime) = readExprs(col("__present_sum"), col("n_registers"))
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__present_sum"),
        count(lit(1)).as("n_registers"))
      .select(groupCols.map(col) ++ Seq(
        est.as("est"), col("n_registers"), regime.as("regime")): _*)
  }

  /** The cardinality estimate read over a register table — the published
    * HLL++ estimator (see [[readExprs]]): linear counting while
    * m ln(m/V) <= 220, the empirically bias-corrected raw estimate up to
    * 5m, the classic raw estimate beyond. Returns one row
    * `(est, n_registers, regime)` with regime in
    * ('linear', 'corrected', 'raw'); float arithmetic stays in this READ,
    * never in the mergeable/oracle-crossing register table.
    *
    * Accuracy honesty, per regime: 'linear' is ~1-2% at these loads.
    * 'corrected' removes the classic estimator's BIAS (up to +70% of the
    * true count near n = m — the single biggest error term in the zone)
    * but NOT the draw variance: one deterministic md5 draw at m = 256
    * still carries ~6.5% standard error, so audit bands in this regime
    * are variance-bound at ~15% (~2.3 sigma), not the ~8% a bias-only
    * view would suggest (q52's sf0.01 draw measures +11.9% corrected vs
    * +16.2% classic — real draws sit multiple sigma out). 'raw' starts at
    * Eraw > 5m where the published correction ends; the classic
    * estimator's residual bias there still reaches ~+13% near the zone
    * edge (q50's sf0.1 draw), hence the 20% raw band.
    */
  def estimate(registers: DataFrame): DataFrame = {
    val (est, regime) = readExprs(col("__present_sum"), col("n_registers"))
    registers
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__present_sum"),
        count(lit(1)).as("n_registers"))
      .select(est.as("est"), col("n_registers"), regime.as("regime"))
  }

  /** The regime-dependent audit band as a fraction of the exact count:
    * 5% linear, 15% corrected, 20% raw (see [[estimate]]'s accuracy
    * notes) — shared by q50/q51/q52 and emitted identically in SQL by
    * [[bandCaseSql]].
    */
  def bandOf(regime: Column): Column =
    when(regime === "linear", lit(0.05))
      .when(regime === "corrected", lit(0.15))
      .otherwise(lit(0.2))

  /** [[bandOf]] in SQL over the expression `regime`. */
  def bandCaseSql(regime: String): String =
    s"CASE WHEN $regime = 'linear' THEN 0.05 " +
      s"WHEN $regime = 'corrected' THEN 0.15 ELSE 0.2 END"

  /** The whole [[estimate]] read as SQL CTE bodies over a `reg(register,
    * rho)` relation named `regRel` (optionally carrying extra group
    * columns listed in `groupCols`) — emits the s/e CTE pair every HLL
    * oracle shares, built from the same driver-side constants as the
    * Spark plan.
    */
  def estimateCtesSql(regRel: String, groupCols: Seq[String]): String = {
    val g = groupCols.map(_ + ", ").mkString
    val gby = if (groupCols.isEmpty) "" else
      s" GROUP BY ${groupCols.mkString(", ")}"
    val eraw = s"$AlphaM2 / (ps + (256 - nr))"
    val lin = s"(256 - nr) > 0 AND 256.0 * ln(256.0 / (256 - nr)) <= $LinearThreshold"
    s"""s AS (SELECT ${g}sum(power(2.0, -rho)) AS ps, count(*) AS nr
       |  FROM $regRel$gby),
       |e0 AS (SELECT ${g}nr, $eraw AS eraw,
       |    CASE WHEN $lin THEN 256.0 * ln(256.0 / (256 - nr)) END AS h,
       |    CASE WHEN $lin THEN 'linear'
       |         WHEN $eraw <= $CorrectionCap THEN 'corrected'
       |         ELSE 'raw' END AS regime
       |  FROM s),
       |e AS (SELECT ${g}nr,
       |    CASE WHEN regime = 'linear' THEN h
       |         WHEN regime = 'corrected' THEN eraw - ${biasCaseSql("eraw")}
       |         ELSE eraw END AS est,
       |    regime
       |  FROM e0)""".stripMargin
  }
}
