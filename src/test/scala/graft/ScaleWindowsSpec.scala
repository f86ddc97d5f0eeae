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
}
