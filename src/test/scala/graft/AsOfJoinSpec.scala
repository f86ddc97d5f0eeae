package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.sources.Tables

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("forward as-of matches the oracle-checked q16 composition") {
    val o = Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "k")
    val li = Tables.load(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "k")
    val res = AsOfJoin(o.select(col("k"), col("o_orderdate")), li,
        keys = Seq("k"),
        leftTime = col("o_orderdate"), rightTime = col("l_shipdate"),
        tieBreak = Seq(col("l_linenumber"), col("l_quantity"), col("l_partkey"), col("l_suppkey")),
        payload = Seq.empty)
      .select(col("k").as("o_orderkey"),
        col("asof.l_linenumber").cast("long").as("first_line"))
    val expected = SparkEntry.queries("q16_asof")(spark, dir)
      .select(col("o_orderkey"), col("first_line"))
    assert(res.exceptAll(expected).isEmpty && expected.exceptAll(res).isEmpty)
  }

  test("backward as-of picks the last right row at-or-before") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a"), (1L, 200L, "b"), (1L, 210L, "c"), (2L, 60L, "x"))
      .toDF("k", "rt", "tag")
    val res = AsOfJoin(left, right, Seq("k"), col("t"), col("rt"),
        tieBreak = Seq(col("tag")), payload = Seq(col("tag")), forward = false)
      .select(col("k"), col("t"), col("asof.tag").as("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // k=2 t=50 has no right row at-or-before => inner join drops it
    assert(res == Set((1L, 100L, "a"), (1L, 205L, "b")))
  }

  test("as-of join plans as partial aggregation, not a window") {
    val o = Tables.load(spark, dir, "orders").withColumnRenamed("o_orderkey", "k")
    val li = Tables.load(spark, dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    val plan = AsOfJoin(o.select(col("k"), col("o_orderdate")), li, Seq("k"),
        col("o_orderdate"), col("l_shipdate"),
        Seq(col("l_linenumber")), Seq.empty)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // struct min lowers to SortAggregate; the scale property is the
    // map-side partial BEFORE the exchange (shuffle carries ~1 row/group
    // per map partition, not every joined row)
    assert(plan.contains("partial_min"), plan)
  }
}
