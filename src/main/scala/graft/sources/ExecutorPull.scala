package graft.sources

import java.util.concurrent.ConcurrentHashMap

import graft.streaming.{InMemoryBroker, PulsarSink}

/** Executor-side KeyShared consumers for the real-broker consume path —
  * the scale-out alternative to [[BrokerSource.PulsarCursor]] (which
  * receives every payload on the driver, parity with the reference's
  * single-process consume loop, pkg/pulsar/pulsar.go:170-224).
  *
  * Design. Pulsar's KeyShared subscription pushes messages; it has no
  * seekable offsets, so no driver can know — or later reproduce — what
  * each consumer will receive. That rules out Kafka-style deterministic
  * replay, but the engine's delivery contract here is the reference's:
  * AT-LEAST-ONCE with per-key order (pulsar.go:109-111). This module
  * keeps that contract while payload bytes never touch the driver:
  *
  *   - The key-hash space is split into `readers` contiguous STICKY hash
  *     ranges (KeySharedPolicy.stickyHashRange, public client API); reader
  *     task i owns range i via a long-lived executor-local consumer, so
  *     per-key order holds end-to-end (one consumer per key at any time).
  *   - The driver plans only (range, epoch) pull tokens — an epoch is the
  *     micro-batch counter carried in the offset log. Each task pulls what
  *     its consumer has NOW (bounded by maxRecords/pollTimeout) and
  *     buffers (message, id) under that epoch.
  *   - Acks ride the NEXT epoch: Spark runs batch e+1 only after batch e
  *     committed, so a task seeing its buffered epoch < current epoch acks
  *     the buffer first. A failed batch means no next epoch: nothing is
  *     acked, a same-epoch rerun re-serves the buffer (the broker does not
  *     redeliver to a live consumer), and an executor loss closes the
  *     consumer so the broker redelivers the unacked messages to the
  *     range's replacement consumer. Nothing is ever acked unserved.
  *
  * A replayed batch may thus serve different messages than its first run —
  * exactly-once sinks cannot be built on this source (the remote_write
  * sink is an at-least-once HTTP POST with retry, like the reference's).
  * Consumers cache per (url, topic, subscription, range) in the executor
  * JVM and close with it; unacked messages then redeliver elsewhere.
  * Same-JVM query restarts resume correctly through the cache: a restart
  * from a committed checkpoint acks the previous incarnation's buffer on
  * its first task (that epoch committed, or the restart would replay it);
  * an uncommitted epoch replays and re-serves the buffer. One RUNNING
  * query per (url, topic, subscription): concurrent queries sharing a
  * subscription would interleave epochs on shared entries — use distinct
  * subscription names, the same one-consumer-group-per-pipeline rule the
  * reference's flag help states (consume.go:42-43).
  */
object ExecutorPull {

  /** One cached consumer + the current epoch's received-but-unacked batch. */
  final class Entry(val consumer: AnyRef) {
    var pendingEpoch: Long = -1L
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(InMemoryBroker.Message, AnyRef)]
  }

  /** Test seam: build the range's consumer — reflection against the public
    * pulsar-client API in production, a fake in specs (local mode keeps
    * driver and executors in one JVM, so specs can inject and observe).
    */
  @volatile private[graft] var consumerFactory:
      (PulsarSink.Config, String, Int, Int) => AnyRef = buildConsumer

  private val entries = new ConcurrentHashMap[(String, Int), Entry]()

  private[graft] def reset(): Unit = {
    entries.values.forEach { e =>
      try PulsarSink.call(e.consumer, "close")
      catch { case _: Exception => () }
    }
    entries.clear()
  }

  private def entryFor(cfg: PulsarSink.Config, subscription: String,
      rangeIdx: Int, readers: Int): Entry =
    entries.computeIfAbsent(
      (s"${cfg.url}:${cfg.topic}:$subscription:$readers", rangeIdx),
      _ => new Entry(consumerFactory(cfg, subscription, rangeIdx, readers)))

  /** KeyShared sticky-range consumer for range `rangeIdx` of `readers`
    * equal slices of the [0, 65535] key-hash space.
    */
  private def buildConsumer(cfg: PulsarSink.Config, subscription: String,
      rangeIdx: Int, readers: Int): AnyRef = {
    import PulsarSink.call
    val client = PulsarSink.buildClient(cfg, "consume from", setOperationTimeout = false)
    val cb = call(client, "newConsumer")
    call(cb, "topic", classOf[String] -> cfg.topic)
    call(cb, "subscriptionName", classOf[String] -> subscription)
    val subType = Class.forName("org.apache.pulsar.client.api.SubscriptionType")
    call(cb, "subscriptionType",
      subType -> subType.getMethod("valueOf", classOf[String])
        .invoke(null, "Key_Shared"))
    val rangeCls = Class.forName("org.apache.pulsar.client.api.Range")
    val lo = (65536L * rangeIdx / readers).toInt
    val hi = (65536L * (rangeIdx + 1) / readers - 1).toInt
    val range = rangeCls.getMethod("of", classOf[Int], classOf[Int])
      .invoke(null, Int.box(lo), Int.box(hi))
    val kspCls = Class.forName("org.apache.pulsar.client.api.KeySharedPolicy")
    val sticky = kspCls.getMethod("stickyHashRange").invoke(null)
    call(sticky, "ranges", rangeCls -> range)
    call(cb, "keySharedPolicy", kspCls -> sticky)
    call(cb, "subscribe")
  }

  private def receive(consumer: AnyRef, timeoutMs: Long): AnyRef =
    PulsarSink.call(consumer, "receive",
      classOf[Int] -> Int.box(timeoutMs.toInt),
      classOf[java.util.concurrent.TimeUnit] ->
        java.util.concurrent.TimeUnit.MILLISECONDS)

  /** The per-task pull: ack the previous epoch's batch (its micro-batch
    * committed, or this epoch would not be running), then serve this
    * epoch's buffer — refilling it up to `maxRecords` from whatever the
    * consumer has within `pollTimeoutMs` (first receive waits, the rest
    * drain non-blocking). A same-epoch rerun serves the same buffer again.
    */
  private[graft] def pull(cfg: PulsarSink.Config, subscription: String,
      rangeIdx: Int, readers: Int, epoch: Long, maxRecords: Long,
      pollTimeoutMs: Long): Array[InMemoryBroker.Message] = {
    import PulsarSink.call
    val e = entryFor(cfg, subscription, rangeIdx, readers)
    e.synchronized {
      if (e.pendingEpoch >= 0 && e.pendingEpoch < epoch && e.pending.nonEmpty) {
        PulsarSink.ackMessageIds(e.consumer, e.pending.map(_._2))
        e.pending.clear()
      }
      e.pendingEpoch = epoch
      // receive ONLY while budget remains: a message dequeued past the cap
      // would be neither served nor acked, and a live consumer gets no
      // redelivery — it would simply vanish
      if (maxRecords <= 0 || e.pending.length < maxRecords) {
        var m = receive(e.consumer, pollTimeoutMs)
        while (m != null) {
          e.pending += ((InMemoryBroker.Message(
            call(m, "getKey").asInstanceOf[String],
            call(m, "getData").asInstanceOf[Array[Byte]]),
            call(m, "getMessageId")))
          m = if (maxRecords > 0 && e.pending.length >= maxRecords) null
              else receive(e.consumer, 0L)
        }
      }
      e.pending.map(_._1).toArray
    }
  }
}
