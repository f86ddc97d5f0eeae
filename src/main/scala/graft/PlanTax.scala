package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (r21 guide §1/§7.3): decompose each declared query's cost into
  * plan-construction (DataFrame building — driver-side Catalyst tree
  * assembly), optimization (analyzed -> executedPlan), and execution (noop
  * sink), so per-query fixed costs (the "plan-construction tax" — the
  * q50 199-arm when-chain lesson) are attributable separately from cluster
  * work. Not part of the driver contract; run:
  *   SPARK_GRAFT_ONLY=a,b sbt -batch "runMain graft.PlanTax"
  * Methodology: one warmup save absorbs codegen/JIT, then per query the
  * probe times build, executedPlan forcing, and TWO noop saves — the
  * second save is the steady-state execution floor, the first-minus-second
  * gap is the re-planning cost a repeated caller pays.
  */
object PlanTax {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup (codegen/JIT/footers)
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      graft.sources.Caches.release(spark)
    }
    println(f"${"query"}%-26s ${"build"}%8s ${"plan"}%8s ${"exec1"}%8s ${"exec2"}%8s")
    val rows = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      graft.sources.Caches.release(spark)
      val r = (name, (t1 - t0) / 1e3, (t2 - t1) / 1e3, (t3 - t2) / 1e3, (t4 - t3) / 1e3)
      println(f"${r._1}%-26s ${r._2 / 1000}%8.1f ${r._3 / 1000}%8.1f ${r._4 / 1000}%8.1f ${r._5 / 1000}%8.1f")
      r
    }
    val (b, p, e1, e2) = rows.foldLeft((0.0, 0.0, 0.0, 0.0)) { case ((a, c, d, e), r) =>
      (a + r._2, c + r._3, d + r._4, e + r._5)
    }
    println(f"TOTAL(ms) build=${b / 1000}%.0f plan=${p / 1000}%.0f exec1=${e1 / 1000}%.0f exec2=${e2 / 1000}%.0f n=${rows.size}")
    spark.stop()
  }
}
