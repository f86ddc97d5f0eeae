package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** The public privacy operators (k-anonymity audit, generalization ladder,
  * l-diversity) on a crafted frame where every settle decision is known by
  * construction. The d180-d182 queries bind these same calls to the
  * testdata tables and go through the DuckDB oracle gate.
  */
class PrivacySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (g, sub, sens): B|x is 5-anonymous at the finest level; A needs one
  // generalization step (A|x=4, A|y=2, but g=A is 6); C (2 rows) falls
  // through to the fallback
  private def df = {
    val s = spark
    import s.implicits._
    (Seq.fill(4)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(5)(("B", "x")) ++ Seq(("C", "x"), ("C", "y")))
      .zipWithIndex
      .map { case ((g, sub), i) => (g, sub, i % 3) }
      .toDF("g", "sub", "sens")
      .withColumn("all", lit("*"))
  }

  test("kAnonymityAudit: class sizes and at-risk flags") {
    val out = Privacy.kAnonymityAudit(df, Seq(col("g"), col("sub")), k = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      ("A", "x") -> (4L, true), ("A", "y") -> (2L, true),
      ("B", "x") -> (5L, false),
      ("C", "x") -> (1L, true), ("C", "y") -> (1L, true)))
  }

  test("generalizeLadder: rows settle at the smallest level reaching k") {
    val out = Privacy.generalizeLadder(df,
        Seq(Seq("g", "sub"), Seq("g"), Seq("all")), k = 5)
      .select("g", "sub", "settle_level", "class_key")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getString(3)))).toSet
    assert(out == Set(
      (("B", "x"), (0, "B|x")),  // 5-anonymous at the finest level
      (("A", "x"), (1, "A")),    // fine classes 4 and 2 < k; g=A is 6
      (("A", "y"), (1, "A")),
      (("C", "x"), (2, "*")),    // g=C is 2 < k: unconditional fallback
      (("C", "y"), (2, "*"))))
    // the fallback level's class size is never consulted: no szN columns leak
    val cols = Privacy.generalizeLadder(df,
      Seq(Seq("g", "sub"), Seq("g"), Seq("all")), k = 5).columns.toSet
    assert(!cols.exists(_.startsWith("sz")), cols.toString)
  }

  test("generalizeLadderWith: reference sizes decide; absent classes fall through") {
    val s = spark
    import s.implicits._
    // dump carries a class the reference has never seen ("D","z") — size 0,
    // maximally identifying, must fall through to the fallback even though
    // the dump itself has it
    val dump = Seq(("B", "x"), ("D", "z"), ("A", "y"))
      .toDF("g", "sub").withColumn("all", lit("*"))
    val out = Privacy.generalizeLadderWith(dump,
        Seq(Seq("g", "sub"), Seq("g"), Seq("all")), k = 5, reference = df)
      .select("g", "sub", "settle_level", "class_key")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getString(3)))).toSet
    assert(out == Set(
      (("B", "x"), (0, "B|x")), // reference class of 5 at the finest level
      (("A", "y"), (1, "A")),   // A|y is 2 in the reference; g=A is 6
      (("D", "z"), (2, "*"))))  // unseen anywhere: falls to the fallback
  }

  test("generalizeRoute: a live stream settles identically to the batch call") {
    val s = spark
    import s.implicits._
    val rows = Seq(("B", "x"), ("A", "x"), ("D", "z"), ("C", "y"))
    val levels = Seq(Seq("g", "sub"), Seq("g"), Seq("all"))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](spark)
    val q = graft.streaming.StreamOps.generalizeRoute(
        ms.toDF().toDF("g", "sub").withColumn("all", lit("*")), levels, 5, df)
      .select("g", "sub", "settle_level", "class_key")
      .writeStream.format("memory").queryName("gen_route_out")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val live = spark.table("gen_route_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
      val batch = Privacy.generalizeLadderWith(
          rows.toDF("g", "sub").withColumn("all", lit("*")), levels, 5, df)
        .select("g", "sub", "settle_level", "class_key")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
      assert(live == batch && live.nonEmpty, s"live=$live batch=$batch")
    } finally q.stop()
  }

  test("lDiversity: distinct sensitive values per class") {
    val out = Privacy.lDiversity(df, Seq(col("g")), col("sens"), l = 3)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // sens cycles 0,1,2 by row index: A (rows 0-5) sees all 3; B (rows
    // 6-10) sees 0,1,2 too; C (rows 11-12) sees only 2 values
    assert(out("A") == ((6L, 3L, true)))
    assert(out("B") == ((5L, 3L, true)))
    assert(out("C") == ((2L, 2L, false)))
  }
}
