package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for EPHEMERAL persists — caches that exist only
  * so one query's plan can consume a subtree twice (the d101/d117/d122
  * shape), as opposed to the bounded cross-query memos (ivfAssigned,
  * dedupClusters, winnowFp), which own their lifecycle.
  *
  * A query closure persists through [[ephemeral]]; the harness (Bench,
  * Verify — or any composed pipeline) calls [[release]] once the returned
  * plan has been fully consumed. Without the release call behavior is
  * exactly the old persist-and-leave; with it, a long-lived session
  * accumulates no cached blocks (`CacheSpec` pins this).
  *
  * Sessions are weak keys: a stopped/collected session drops its list.
  */
object Caches {

  private val reg =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayList[DataFrame]]

  /** Persist `df` and register it for the session-wide [[release]]. */
  def ephemeral(df: DataFrame): DataFrame = {
    df.persist()
    reg.synchronized {
      reg.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayList[DataFrame]).add(df)
    }
    df
  }

  /** Unpersist every ephemeral cache registered for `spark` since the last
    * release. Safe to call between queries: cross-query memos are NOT
    * registered here and keep their caches.
    */
  def release(spark: SparkSession): Unit = {
    val drained = reg.synchronized {
      val l = reg.remove(spark)
      if (l == null) java.util.Collections.emptyList[DataFrame] else l
    }
    drained.forEach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () }
    }
  }

  /** Registered-but-unreleased count for `spark` (test surface). */
  def ephemeralCount(spark: SparkSession): Int = reg.synchronized {
    val l = reg.get(spark)
    if (l == null) 0 else l.size
  }
}
