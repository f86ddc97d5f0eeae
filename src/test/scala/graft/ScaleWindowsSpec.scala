package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleWindows

/** The banded below-count must equal the naive global cumulation exactly —
  * including negative values (pmod banding) and values straddling band
  * boundaries — while never windowing more than one band in a partition.
  */
class ScaleWindowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bandedBelow equals the brute-force below-count on random signed values") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(_ => (rnd.nextLong() % 10000, 1L + rnd.nextInt(5)))
      .distinctBy(_._1)
    val df = rows.toDF("v", "w")
    for (width <- Seq(1L, 7L, 100L, 1000000L)) {
      val got = ScaleWindows.bandedBelow(df, "v", "w", width)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (v, _) =>
        val expect = rows.filter(_._1 < v).map(_._2).sum
        assert(got(v) == expect, s"width $width value $v: ${got(v)} != $expect")
      }
    }
  }

  test("the plan partitions the within-band window and broadcasts band totals") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(v => (v * 3 - 150, 1L)).toDF("v", "w")
    val p = ScaleWindows.bandedBelow(df, "v", "w", 10L)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__band"),
      "within-band cumulation must exchange on the band hash\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "band totals must join back as a broadcast\n" + p)
  }

  test("bandedBelowBy computes per-group below-counts (signed values, all widths)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300)
      .map(_ => (s"g${rnd.nextInt(3)}", rnd.nextLong() % 5000, 1L + rnd.nextInt(4)))
      .distinctBy(t => (t._1, t._2))
    val df = rows.toDF("g", "v", "w")
    for (width <- Seq(1L, 13L, 500L); levels <- Seq(1, 2)) {
      val got = ScaleWindows.bandedBelowBy(df, Seq("g"), "v", "w", width, levels)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      rows.foreach { case (g, v, _) =>
        val expect = rows.filter(t => t._1 == g && t._2 < v).map(_._3).sum
        assert(got((g, v)) == expect,
          s"width $width levels $levels group $g value $v: ${got((g, v))} != $expect")
      }
    }
  }

  test("levels=2 equals levels=1 exactly and never globally windows the level-1 band table") {
    val s = spark
    import s.implicits._
    // values spread over a range >> bandWidth² so both recursion levels engage
    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map(_ => (rnd.nextLong() % 100000000L, 1L + rnd.nextInt(3)))
      .distinctBy(_._1)
    val df = rows.toDF("v", "w")
    val one = ScaleWindows.bandedBelow(df, "v", "w", 100L, levels = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = ScaleWindows.bandedBelow(df, "v", "w", 100L, levels = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == two)
    // plan shape: every cumulative-sum window frame carries a band partition
    // except the single terminal one over the doubly-contracted table
    val p = ScaleWindows.bandedBelow(df, "v", "w", 100L, levels = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__band"), p)
  }

  test("fractional value columns band by floor(v/width) and stay exact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map(_ => (rnd.nextInt(20000) / 7.0 - 1000.0, 1L + rnd.nextInt(3)))
      .distinctBy(_._1)
    val df = rows.toDF("v", "w")
    val got = ScaleWindows.bandedBelow(df, "v", "w", 250L)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    rows.foreach { case (v, _) =>
      val expect = rows.filter(_._1 < v).map(_._2).sum
      assert(got(v) == expect)
    }
  }

  test("rankTable's value-at-rank aggregate reproduces exact medians per group") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(53)
    val raw = (1 to 500).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(100).toDouble))
    val counts = raw.toDF("g", "v").groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val got = ScaleWindows.rankTable(counts, Seq("g"), "v", "cnt", 10L)
      .groupBy(col("g"))
      .agg(((min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))) +
            min(when(col("cum") >= expr("(n + 2) DIV 2"), col("v")))) / 2).as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    raw.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val expect = (sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)) / 2
      assert(got(g) == expect, s"group $g: ${got(g)} != $expect")
    }
  }
}
