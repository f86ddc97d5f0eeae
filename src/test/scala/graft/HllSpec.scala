package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll

/** The engine-exact HLL register table: recomputed against a plain-JVM
  * reference, the register-wise-max merge law, and the two estimator
  * regimes. (q49/q50 pin the same arithmetic against DuckDB; the streaming
  * twin is pinned in StreamOpsSpec.)
  */
class HllSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def jvmRegRho(key: String): (Long, Long) = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = dig.map("%02x".format(_)).mkString.substring(0, 15)
    val v = java.lang.Long.parseLong(hex, 16)
    val w = v >>> 8
    val rho = if (w == 0L) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (v % Hll.M, rho)
  }

  test("registers match a plain-JVM recompute of the md5/shift arithmetic") {
    val s = spark
    import s.implicits._
    val keys = (0 until 500).map(i => s"user$i")
    val out = Hll.registers(keys.toDF("k").repartition(3), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = keys.map(jvmRegRho).groupBy(_._1)
      .map { case (reg, rs) => reg -> rs.map(_._2).max }
    assert(out == expect, s"registers diverge from the JVM reference")
  }

  test("merge law: register-wise max of two shards equals the whole build") {
    val s = spark
    import s.implicits._
    val keys = (0 until 400).map(i => s"u$i")
    val whole = Hll.registers(keys.toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = Hll.registers(keys.filter(_.hashCode % 2 == 0).toDF("k"), "k")
    val b = Hll.registers(keys.filter(_.hashCode % 2 != 0).toDF("k"), "k")
    val merged = a.unionByName(b).groupBy("register")
      .agg(max(col("rho")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == whole, "HLL merge must be register-wise max")
  }

  test("estimate regimes: linear counting small, raw harmonic large, both within band") {
    val s = spark
    import s.implicits._
    // 100 distincts: linear regime (m ln(m/V) = 100.3 <= 220). Its
    // accuracy at t = n/m = 0.39 is sigma = sqrt(m(e^t - t - 1))/n ~
    // 4.2%, so band at ~2 sigma (this fixed draw reads 94.5 — one-time,
    // deterministic)
    val small = Hll.estimate(
      Hll.registers((0 until 100).map(i => s"s$i").toDF("k"), "k")).collect().head
    assert(small.getString(2) == "linear",
      "100 distincts must read via linear counting")
    assert(math.abs(small.getDouble(0) - 100.0) <= 8.5, small.toString)
    // 20000 distincts (n/m ~ 78): raw regime, past the published
    // correction zone (Eraw >> 5m); 20% band = ~3 sigma of m=256's 6.5%
    // standard error
    val big = Hll.estimate(
      Hll.registers((0 until 20000).map(i => s"b$i").toDF("k"), "k")).collect().head
    assert(big.getString(2) == "raw",
      "20000 distincts must read via the raw estimate")
    assert(math.abs(big.getDouble(0) - 20000.0) <= 4000.0, big.toString)
  }

  test("corrected regime: the published bias table beats the classic raw estimate") {
    val s = spark
    import s.implicits._
    // 250 distincts: V > 0 but m ln(m/V) > 220, Eraw <= 5m — the
    // published empirical-correction zone. This deterministic draw's
    // classic raw estimate reads 345.8 (+38.3%); the corrected read must
    // (a) be flagged 'corrected', (b) strictly beat the classic error,
    // (c) land inside the 15% corrected band (it reads 269.9, +8.0%).
    val regs = Hll.registers((0 until 250).map(i => s"u%06d".format(i)).toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ps = regs.map { case (_, rho) => math.pow(2.0, -rho.toDouble) }.sum
    val v = (Hll.M - regs.length).toDouble
    val classic = Hll.AlphaM2 / (ps + v)
    val read = Hll.estimate(
      Hll.registers((0 until 250).map(i => s"u%06d".format(i)).toDF("k"), "k"))
      .collect().head
    assert(read.getString(2) == "corrected", read.toString)
    val corrected = read.getDouble(0)
    assert(math.abs(corrected - 250.0) < math.abs(classic - 250.0),
      s"corrected $corrected must beat classic $classic against truth 250")
    assert(math.abs(corrected - 250.0) <= 0.15 * 250.0, read.toString)
    // the same knots the plan interpolates: a JVM replay of the
    // piecewise-linear bias at THIS classic estimate agrees with the
    // in-plan when-chain
    val i = Hll.RawEstimates.indexWhere(classic < _)
    val bias =
      if (i < 0) Hll.Biases.last
      else if (i == 0) Hll.Biases.head
      else Hll.Biases(i - 1) + (classic - Hll.RawEstimates(i - 1)) *
        (Hll.Biases(i) - Hll.Biases(i - 1)) /
        (Hll.RawEstimates(i) - Hll.RawEstimates(i - 1))
    assert(math.abs((classic - bias) - corrected) < 1e-6,
      s"plan bias chain diverges from the JVM replay: ${classic - bias} vs $corrected")
  }
}
