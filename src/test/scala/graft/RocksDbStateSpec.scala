package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** The streaming state-store posture for 100 TB state: the stateful twins
  * run unmodified under the RocksDB state store provider (the standard
  * choice once keyed state outgrows executor heap — HDFS-backed state is
  * an in-memory map per partition; RocksDB spills to local SSD). Nothing
  * in the operators changes: the provider is one session conf, and the
  * outputs are batch-identical — which is exactly the claim SURVEY §9's
  * streaming posture makes.
  */
class RocksDbStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("funnel state (mapGroupsWithState) is batch-identical under RocksDB") {
    val s = spark
    import s.implicits._
    import StreamOps.FunnelEvent
    withRocksDb {
      val ms = MemoryStream[FunnelEvent](spark)
      val q = StreamOps.funnelState(ms.toDS(), Seq("view", "click", "purchase"))
        .writeStream.format("memory").queryName("funnel_rocks")
        .outputMode("append").start()
      try {
        ms.addData(
          FunnelEvent(1L, "purchase", 30L), FunnelEvent(1L, "view", 10L),
          FunnelEvent(1L, "click", 20L), FunnelEvent(2L, "click", 10L))
        q.processAllAvailable()
        ms.addData(FunnelEvent(2L, "view", 20L), FunnelEvent(2L, "click", 30L),
          FunnelEvent(1L, "view", 5L))
        q.processAllAvailable()
        // the RocksDB provider actually served the state (custom metrics
        // only the RocksDB store reports)
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet().toString.contains("rocksdb"),
          s"expected rocksdb state metrics, got $metrics")
        // identical decisions to the HDFS-backed run in StreamOpsSpec
        val rows = spark.table("funnel_rocks").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
        assert(rows == Set(
          (1L, 1, "view", 10L), (1L, 2, "click", 20L), (1L, 3, "purchase", 30L),
          (2L, 1, "view", 20L), (2L, 2, "click", 30L)), rows.mkString(","))
      } finally q.stop()
    }
  }

  test("windowed tumbling aggregation is batch-identical under RocksDB") {
    val s = spark
    import s.implicits._
    withRocksDb {
      val ms = MemoryStream[(Timestamp, Long)](spark)
      val sk = StreamOps.histogramSketch(
        ms.toDF().toDF("et", "len"), "et", "5 seconds", "10 seconds", "len",
        binWidth = 16L, nBins = 4)
      val q = sk.writeStream.format("memory").queryName("hist_rocks")
        .outputMode("append").start()
      try {
        ms.addData((ts(1), 3L), (ts(2), 17L))
        q.processAllAvailable()
        ms.addData((ts(3), 15L), (ts(4), 999L))
        q.processAllAvailable()
        ms.addData((ts(30), 1L))
        q.processAllAvailable()
        val rows = spark.table("hist_rocks").collect()
          .filter(_.getTimestamp(0).getTime == 0L)
          .map(r => (r.getLong(1), r.getLong(2))).toMap
        assert(rows == Map(0L -> 2L, 1L -> 1L, 3L -> 1L), rows.toString)
      } finally q.stop()
    }
  }
}
