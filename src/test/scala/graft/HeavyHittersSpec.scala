package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HeavyHitters.heavy_hitters

class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("capacity >= distinct keys: sketch counts are exact across partitions") {
    val s = spark
    import s.implicits._
    val rows = (1 to 10000).map(i => ("g", s"k${i % 7}"))
    val expected = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val df = rows.toDF("g", "k").repartition(8)
    val m = df.groupBy(col("g")).agg(heavy_hitters(16, col("k")).as("hh"))
      .select(col("hh")).collect().head.getMap[String, Long](0)
    assert(m.toMap == expected, m)
  }

  test("capacity < distinct: true heavy hitter survives with bounded undercount") {
    val s = spark
    import s.implicits._
    // 60% "hot", rest spread over 50 cold keys; capacity 4 << 51 distinct
    val rows = (1 to 10000).map(i => ("g", if (i % 5 < 3) "hot" else s"cold${i % 50}"))
    val df = rows.toDF("g", "k").repartition(8)
    val m = df.groupBy(col("g")).agg(heavy_hitters(4, col("k")).as("hh"))
      .select(col("hh")).collect().head.getMap[String, Long](0)
    val n = rows.size.toLong
    val trueHot = rows.count(_._2 == "hot").toLong
    assert(m.size <= 4)
    // MG guarantee: any key with freq > n/(capacity+1) is present, and its
    // counter undercounts by at most n/(capacity+1)
    assert(m.contains("hot"), m)
    assert(m("hot") <= trueHot && m("hot") >= trueHot - n / 5, m)
  }

  test("plan partially aggregates the sketch map-side") {
    val s = spark
    import s.implicits._
    val plan = (1 to 100).map(i => ("g", s"k$i")).toDF("g", "k")
      .groupBy(col("g")).agg(heavy_hitters(8, col("k")).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_heavy_hitters"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
