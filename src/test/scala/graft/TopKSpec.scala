package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKStruct.topk_struct

class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def data = {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random scores incl. duplicates across groups
    (1 to 5000).map { i =>
      val g = i % 13
      val score = ((i * 2654435761L) % 10007).toDouble / 7.0
      (g, score, i.toLong)
    }.toDF("g", "score", "id")
  }

  test("topk_struct equals the row_number window formulation") {
    val viaAgg = data.groupBy(col("g"))
      .agg(topk_struct(7, struct((-col("score")).as("ns"), col("id"))).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        (-col("t.ns")).as("score"), col("t.id").as("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = data.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select(col("g"), col("rank"), col("score"), col("id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topk_struct partially aggregates (no window, partial before exchange)") {
    val plan = data.groupBy(col("g"))
      .agg(topk_struct(3, struct(col("score"), col("id"))).as("tk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topk_struct"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("buffer trims: groups larger than 4k and tiny groups both exact") {
    val s = spark
    import s.implicits._
    val skewed = (1 to 20000).map(i => (if (i <= 19990) 0 else i, i.toLong)).toDF("g", "v")
    val got = skewed.groupBy(col("g"))
      .agg(topk_struct(2, struct(col("v"))).as("tk"))
      .select(col("g"), col("tk.v").as("vs"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toList)).toMap
    assert(got(0) == List(1L, 2L))
    assert(got(19991) == List(19991L))
  }
}
