package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventSamples

/** GraftExtensions: function injection + the FoldKernelCalls optimizer rule.
  * Built as a separate session (extensions apply at session construction);
  * the shared default session is restored afterwards so other suites are
  * unaffected.
  */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions (not just the conf): a shared SparkContext from an
    // earlier suite would otherwise ignore the builder's static conf
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("extensions inject the SQL function surface without register()") {
    withExtendedSession { s =>
      val out = s.sql(
        """SELECT prom_series_key(map('__name__','up','job','node'), 't1') AS k,
          |       simhash64('a b') AS sh, fingerprint64('x') AS fp""".stripMargin)
        .collect().head
      assert(out.getString(0).startsWith("hex "))
      assert(out.getString(1).length == 64)
    }
  }

  test("FoldKernelCalls folds literal kernel calls so predicates push down") {
    withExtendedSession { s =>
      val samples = EventSamples.df(s, "/root/testdata/sf0.001")
        .withColumn("key", graft.functions.prom.series_key(
          org.apache.spark.sql.functions.col("labels"),
          org.apache.spark.sql.functions.col("tenantId")))
      val parquetDir = java.nio.file.Files.createTempDirectory("graft-keys").toString
      samples.write.mode("overwrite").parquet(parquetDir)
      // constant-key lookup: the kernel call over literals must fold so the
      // equality reaches the parquet scan as a pushed filter
      val probe = s.read.parquet(parquetDir).filter(
        """key = prom_series_key(map('__name__','login','host','h1'), '')""")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(key), EqualTo(key,hex "),
        "kernel call not folded to a pushable literal:\n" + plan)
      // and the fold is semantics-preserving: same rows as the runtime path
      val runtime = s.read.parquet(parquetDir).collect()
        .count(r => r.getAs[String]("key") ==
          graft.functions.PromKernel.seriesKey(
            Array("__name__", "host"), Array("login", "h1"), "", Array("__replica__")))
      assert(probe.count() == runtime)
    }
  }
}
