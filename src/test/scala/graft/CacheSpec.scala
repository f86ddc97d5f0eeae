package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle hygiene: ephemeral per-query persists must all drain
  * through `Caches.release` (the Bench/Verify per-query contract), so a
  * long-lived session accumulates no cached blocks beyond the bounded
  * cross-query memos.
  */
class CacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("persisting queries register ephemerally and release drains them") {
    sources.Caches.release(spark) // clean slate
    assert(sources.Caches.ephemeralCount(spark) == 0)
    // d117 (bigram stream), d101 (prefix-filter gram table), d122 (three
    // gram tables) were the flagged persist-and-leave sites
    for (q <- Seq("d117_crossval_lm", "d101_prefix_filter", "d122_dup_length_profile")) {
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    }
    assert(sources.Caches.ephemeralCount(spark) >= 5,
      "the flagged sites must register their persists")
    sources.Caches.release(spark)
    assert(sources.Caches.ephemeralCount(spark) == 0)
  }

  test("release leaves results correct (plans recompute after unpersist)") {
    val before = SparkEntry.queries("d117_crossval_lm")(spark, dir).collect().toSeq
    sources.Caches.release(spark)
    val after = SparkEntry.queries("d117_crossval_lm")(spark, dir).collect().toSeq
    sources.Caches.release(spark)
    assert(before == after)
  }

  test("iterative-loop checkpoint blocks register and release drains them") {
    sources.Caches.release(spark)
    assert(sources.Caches.checkpointCount(spark) == 0)
    // d156's per-round localCheckpoints route through Caches.checkpointed
    val out = SparkEntry.queries("d156_kcore_peel")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(sources.Caches.checkpointCount(spark) >= 3,
      "per-round checkpoints must register for release")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    sources.Caches.release(spark)
    assert(sources.Caches.checkpointCount(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.size < persistedBefore,
      "release must actually drop the checkpoint storage blocks")
  }

  test("memoized dedup clusters survive a release (memo owns its lineage)") {
    // the cross-query memo must NOT depend on release-able checkpoint
    // blocks: consume it, release, then force recomputation paths again
    val before = SparkEntry.queries("d15_dedup_clusters")(spark, dir).collect().toSeq
    sources.Caches.release(spark)
    val after = SparkEntry.queries("d15_dedup_clusters")(spark, dir).collect().toSeq
    sources.Caches.release(spark)
    assert(before == after)
  }

  test("operator-level persists (Allocation, prefixFilterPairs) drain too") {
    val s = spark
    import s.implicits._
    sources.Caches.release(spark)
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "wt")
    val alloc = operators.Allocation.apportion(w, "k", "wt", 7L).collect()
    assert(alloc.map(_.getLong(3)).sum == 7L)
    assert(sources.Caches.ephemeralCount(spark) >= 1)
    sources.Caches.release(spark)
    assert(sources.Caches.ephemeralCount(spark) == 0)
  }
}
