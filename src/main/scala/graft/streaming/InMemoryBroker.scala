package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

/** In-memory keyed message broker — the test/e2e stand-in for Pulsar
  * (operators #12/#13). Implements the same contracts the production
  * connector would implement against the public pulsar-client API:
  * key-ordered append (KeyShared semantics come from the series key — same
  * key always lands in the same per-key FIFO), at-least-once consume.
  */
object InMemoryBroker {

  final case class Message(key: String, payload: Array[Byte])

  private val topics = new ConcurrentHashMap[String, ConcurrentLinkedQueue[Message]]()

  def topic(name: String): ConcurrentLinkedQueue[Message] =
    topics.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[Message]())

  def clear(name: String): Unit = topics.remove(name)

  def drain(name: String): Seq[Message] = {
    val q = topic(name)
    val out = scala.collection.mutable.ArrayBuffer.empty[Message]
    var m = q.poll()
    while (m != null) { out += m; m = q.poll() }
    out.toSeq
  }

  /** KeyedSink factory publishing to an in-memory topic. */
  final class Factory(topicName: String) extends KeyedSink.ProducerFactory {
    override def create(partitionId: Long): KeyedSink.Producer = new KeyedSink.Producer {
      private val q = topic(topicName)
      override def sendAsync(key: String, payload: Array[Byte]): Unit =
        q.add(Message(key, payload))
      override def flush(): Unit = ()
      override def close(): Unit = ()
    }
  }
}
