package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QSketch

/** The engine-exact log-linear quantile sketch: bucket arithmetic against
  * a plain-JVM replay, the add-counts merge law, the containment
  * guarantee of the quantile read, and the positive-values contract.
  * (q53/q54 pin the same arithmetic against DuckDB; the streaming twin is
  * pinned in StreamOpsSpec.)
  */
class QSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def jvmBucket(v: Long): (Long, Long) = {
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v)
    val s = math.max(bitLen - 1 - QSketch.SubBits, 0)
    val lo = (v >> s) << s
    (lo, lo + (1L << s) - 1L)
  }

  test("bucket edges match a plain-JVM replay; relative width is bounded") {
    val s = spark
    import s.implicits._
    val vals = Seq(1L, 2L, 31L, 32L, 63L, 64L, 65L, 127L, 128L, 1000L,
      123456L, 999999999L, 10485755L)
    val out = vals.toDF("v")
      .select(col("v"), QSketch.bucketLo(col("v")).as("lo"))
      .select(col("v"), col("lo"), QSketch.bucketHi(col("lo")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    vals.foreach { v =>
      val (lo, hi) = jvmBucket(v)
      assert(out(v) == ((lo, hi)), s"v=$v: got ${out(v)}, expect ($lo, $hi)")
      assert(lo <= v && v <= hi, s"v=$v outside its own bucket [$lo, $hi]")
      // width bound: values below 2^(SubBits+1) are exact singletons;
      // above, hi/lo <= 1 + 2^-SubBits
      if (v < (1L << (QSketch.SubBits + 1))) assert(lo == v && hi == v)
      else assert((hi - lo).toDouble / lo <= math.pow(2.0, -QSketch.SubBits),
        s"v=$v: bucket [$lo, $hi] too wide")
    }
  }

  test("merge law: summed shard states equal the whole-corpus state") {
    val s = spark
    import s.implicits._
    val vals = (1L to 700L) ++ (1L to 100L).map(_ * 997L)
    val whole = QSketch.sketch(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (a, b) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    val merged = QSketch.sketch(a.map(_._1).toDF("v"), "v")
      .unionByName(QSketch.sketch(b.map(_._1).toDF("v"), "v"))
      .groupBy("bucket_lo").agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == whole && whole.values.sum == vals.size.toLong)
  }

  test("quantile reads contain the exact ranked value and report the right target") {
    val s = spark
    import s.implicits._
    val vals = (1L to 1000L)
    val reads = QSketch.quantileReads(
        QSketch.sketch(vals.toDF("v"), "v"), Seq(0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val sorted = vals.sorted
    reads.foreach { case (q, (lo, hi, target)) =>
      assert(target == math.max(1L, math.ceil(q * vals.size).toLong))
      val exact = sorted((target - 1).toInt)
      assert(lo <= exact && exact <= hi,
        s"q=$q: exact $exact outside [$lo, $hi]")
    }
    // q = 1.0 must reach the max's bucket
    assert(reads(1.0)._1 <= 1000L && 1000L <= reads(1.0)._2)
  }

  test("signed buckets: keys sort in value order, edges mirror, reads contain the exact value") {
    val s = spark
    import s.implicits._
    // mixed-sign population incl. zero and sub-singleton magnitudes
    val vals = (-500L to 500L) ++ Seq(-99999L, 99999L, 0L, -63L, 63L)
    val keyed = vals.toDF("v")
      .select(col("v"), QSketch.bucketKeySigned(col("v")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def jvmKey(v: Long): Long = {
      if (v == 0L) 0L
      else {
        val a = math.abs(v)
        val s0 = math.max((64 - java.lang.Long.numberOfLeadingZeros(a)) - 1 - QSketch.SubBits, 0)
        val lo = (a >> s0) << s0
        if (v > 0) lo else -lo
      }
    }
    vals.foreach(v => assert(keyed(v) == jvmKey(v), s"v=$v key ${keyed(v)} != ${jvmKey(v)}"))
    // keys are monotone in the value: sorting by key never reorders values
    // across bucket boundaries (the property the sign-blind walk needs)
    val pairs = vals.distinct.sorted.map(v => (v, keyed(v)))
    pairs.sliding(2).foreach { case Seq((v1, k1), (v2, k2)) =>
      assert(k1 <= k2, s"keys must be monotone: v=$v1 k=$k1 vs v=$v2 k=$k2")
    case _ => }
    // containment on the mixed-sign population, incl. a quantile that
    // lands in the negatives
    val reads = QSketch.quantileReadsSigned(
        QSketch.sketchSigned(vals.toDF("v"), "v"), Seq(0.1, 0.5, 0.95))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val sorted = vals.sorted
    reads.foreach { case (q, (lo, hi, target)) =>
      val exact = sorted((target - 1).toInt)
      assert(lo <= exact && exact <= hi, s"q=$q: exact $exact outside [$lo, $hi]")
    }
    assert(reads(0.1)._2 < 0L, "q=0.1 must land in a negative bucket")
  }

  test("non-positive values are refused in-plan") {
    val s = spark
    import s.implicits._
    val e = intercept[Exception] {
      QSketch.sketch(Seq(5L, 0L).toDF("v"), "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("QSketch requires positive values")),
      e.toString)
  }
}
