package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Model.Sample

/** Stateful per-tenant batching — the reference's one genuinely stateful
  * operator (remote/write.go:27-43,115-242).
  *
  * Semantics preserved:
  *   - group samples by tenantId (write.go:31)
  *   - emit a batch when the buffer reaches `batchSize` (default 100,
  *     write.go:67) — size-triggered batches flush inline;
  *   - otherwise flush on deadline = FIRST buffered sample's arrival time +
  *     `batchMaxDelayMs` (default 5s; anchor semantics at write.go:148-151),
  *     mapped to a per-group ProcessingTimeTimeout;
  *   - the reference's 100ms checkInterval becomes the streaming trigger
  *     interval (Trigger.ProcessingTime), and its global backpressure on
  *     retryable sink errors comes free from micro-batch retry (failed batch
  *     => no offset commit => replay).
  *
  * Scale: state is O(active tenants x batchSize) rows, hash-partitioned by
  * tenant across executors by the groupByKey shuffle — the same keying the
  * reference gets from its per-tenant map, but distributed.
  */
object TenantBatcher {

  final case class Config(batchSize: Int = 100, batchMaxDelayMs: Long = 5000L)

  /** One emitted remote_write batch. */
  final case class Batch(
      tenantId: String,
      samples: Seq[Sample],
      size: Int,
      reason: String) // "size" | "deadline"

  /** Buffered state per tenant. */
  final case class BatchState(buffer: Seq[Sample], firstArrivalMs: Long)

  def apply(ds: Dataset[Sample], cfg: Config = Config()): Dataset[Batch] = {
    implicit val batchEnc = Encoders.product[Batch]
    implicit val stateEnc = Encoders.product[BatchState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(s => Option(s.tenantId).getOrElse(""))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        process(cfg))
  }

  private def process(cfg: Config)(
      tenant: String,
      incoming: Iterator[Sample],
      state: GroupState[BatchState]): Iterator[Batch] = {
    val now = state.getCurrentProcessingTimeMs()
    val prior = state.getOption.map(_.buffer).getOrElse(Seq.empty)
    val firstArrival = state.getOption.map(_.firstArrivalMs).getOrElse(now)
    val all = prior ++ incoming

    val out = scala.collection.mutable.ArrayBuffer.empty[Batch]
    var buf = all
    // size-triggered flushes (write.go:174-177)
    while (buf.size >= cfg.batchSize) {
      val (b, rest) = buf.splitAt(cfg.batchSize)
      out += Batch(tenant, b, b.size, "size")
      buf = rest
    }

    if (state.hasTimedOut) {
      // deadline passed (write.go:178-181): flush remainder, clear state
      if (buf.nonEmpty) out += Batch(tenant, buf, buf.size, "deadline")
      state.remove()
    } else if (buf.isEmpty) {
      state.remove()
    } else {
      // deadline anchored at the FIRST sample of the pending batch
      val anchor = if (prior.isEmpty) now else firstArrival
      state.update(BatchState(buf, anchor))
      val remaining = math.max(anchor + cfg.batchMaxDelayMs - now, 1L)
      state.setTimeoutDuration(remaining)
    }
    out.iterator
  }
}
