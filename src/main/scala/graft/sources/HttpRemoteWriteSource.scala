package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PromKernel

/** Operator #1: HTTP remote_write receiver source (reference:
  * pkg/app/produce.go:124-152, pkg/app/server.go, pkg/context/handlers.go).
  *
  * A DataSource V2 `MicroBatchStream`: an embedded HTTP server accepts
  * remote_write POSTs, validates them exactly like the reference's handler
  * (read failure => 500, snappy/proto failure => 400, else 200 — the 200 is
  * sent only after the payload is durably enqueued, mirroring the
  * respond-after-flush contract at produce.go:164-181), extracts the tenant
  * inputs (BasicAuth user + X-Scope-OrgID header, handlers.go:29-40), and
  * exposes micro-batches of:
  *
  *   body BINARY, basicAuthUser STRING, orgIdHeader STRING, receivedAtMs LONG
  *
  * Scale posture: an HTTP push receiver is inherently a single-ingress
  * component (the reference is one process too). For 100 TB replay/ingest
  * the same query runs unchanged over a landing zone (parquet/Kafka dirs) —
  * this source exists for protocol parity and live ingest, with the
  * decode/flatten/serialize pipeline identical in both paths.
  *
  * Usage: spark.readStream.format("graft.sources.HttpRemoteWriteProvider")
  *   .option("port", "9201").option("path", "/write").load()
  */
object HttpRemoteWriteSource {

  val schema: StructType = StructType(Seq(
    StructField("body", BinaryType, nullable = false),
    StructField("basicAuthUser", StringType, nullable = true),
    StructField("orgIdHeader", StringType, nullable = true),
    StructField("receivedAtMs", LongType, nullable = false)
  ))

  final case class Received(
      body: Array[Byte],
      basicAuthUser: String,
      orgIdHeader: String,
      receivedAtMs: Long)

  /** One receiver per (JVM, port): buffered messages with monotonic seqnos.
    * maxConnectionAgeMs > 0 reproduces MaxConnectionAgeHandler
    * (pkg/context/handlers.go:42-49): connections older than the limit get
    * `Connection: close` so load balancers can re-spread clients.
    * pprof=true serves a JVM profiling facade under /debug/pprof/ (the
    * reference registers Go pprof there, server.go:84-92; the JVM analog is
    * a thread dump + heap summary — deep profiling belongs to the Spark UI).
    * `host` binds a specific interface (the host half of the reference's
    * `--web.listen-address`, app.go:60-62; empty = all interfaces) and
    * `telemetryPath` relocates the metrics endpoint
    * (`--web.telemetry-path`, app.go:65-67).
    */
  final class Receiver(port: Int, path: String, validate: Boolean,
      maxConnectionAgeMs: Long = 0L, pprof: Boolean = true,
      host: String = "", telemetryPath: String = "/metrics") {
    private[HttpRemoteWriteSource] val config =
      (port, path, validate, maxConnectionAgeMs, pprof, host, telemetryPath)
    private val buf = new java.util.concurrent.ConcurrentSkipListMap[Long, Received]()
    private val seq = new AtomicLong(0L)
    private val connBirth = new ConcurrentHashMap[String, java.lang.Long]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    /** Synchronous multi-writer mode (produce.go:155-181): when writers are
      * configured, each request is decoded, fanned out to every writer
      * concurrently, and the response reflects the outcome — 200 only when
      * all writers succeeded, else 500 listing the failed writer names. The
      * async enqueue path (streaming pipeline) is bypassed; the writers ARE
      * the destinations, exactly the reference's architecture (it responds
      * only after its pulsar flush too).
      */
    @volatile private var writers: Seq[graft.streaming.Writers.RequestWriter] = Nil
    // --send-timeout (produce.go:45-46): the shared fan-out deadline
    @volatile private var writerTimeoutMs: Long = 30000L
    def setWriters(ws: Seq[graft.streaming.Writers.RequestWriter],
        timeoutMs: Long = 30000L): Unit = { writers = ws; writerTimeoutMs = timeoutMs }

    /** handlers.go:42-49: stamp Connection: close when the (keep-alive)
      * connection — identified by the client socket address — is too old.
      */
    private def ageGate(e: com.sun.net.httpserver.HttpExchange): Unit = {
      if (maxConnectionAgeMs > 0L) {
        val id = e.getRemoteAddress.toString
        val now = System.currentTimeMillis()
        val birth = connBirth.computeIfAbsent(id, _ => java.lang.Long.valueOf(now))
        if (now - birth >= maxConnectionAgeMs) {
          e.getResponseHeaders.set("Connection", "close")
          connBirth.remove(id)
        }
      }
    }

    def boundPort: Int = server.getAddress.getPort

    def start(): Unit = synchronized {
      if (server != null) return
      val addr =
        if (host.isEmpty) new java.net.InetSocketAddress(port)
        else new java.net.InetSocketAddress(host, port)
      server = com.sun.net.httpserver.HttpServer.create(addr, 0)
      server.createContext(path, (exchange: com.sun.net.httpserver.HttpExchange) => {
        try {
          ageGate(exchange)
          val body =
            try exchange.getRequestBody.readAllBytes()
            catch { case _: Exception => respond(exchange, 500); null }
          if (body != null) {
            val ws = writers
            if (ws.nonEmpty) handleSync(exchange, body, ws)
            else if (validate && !valid(body)) respond(exchange, 400)
            else {
              buf.put(seq.getAndIncrement(),
                Received(body, authUser(exchange), orgHeader(exchange),
                  System.currentTimeMillis()))
              respond(exchange, 200) // enqueued durably before the 200
            }
          }
        } finally exchange.close()
      })
      // /ready static ok (server.go:76-81)
      server.createContext("/ready", (e: com.sun.net.httpserver.HttpExchange) => {
        e.sendResponseHeaders(200, 0); e.getResponseBody.write("ready\n".getBytes); e.close()
      })
      // telemetry path (default /metrics): prometheus text exposition of the
      // engine registry (server.go:71-73 registers the handler on the
      // configurable --web.telemetry-path; instruments in graft.streaming.Metrics)
      server.createContext(telemetryPath, (e: com.sun.net.httpserver.HttpExchange) => {
        val body = graft.streaming.Metrics.render().getBytes("UTF-8")
        e.sendResponseHeaders(200, body.length); e.getResponseBody.write(body); e.close()
      })
      // /debug/pprof/ JVM facade (server.go:84-92; gated by the reference's
      // --web.disable-pprof): goroutine-dump analog = thread stacks; heap
      // line from the MemoryMXBean
      if (pprof) server.createContext("/debug/pprof/",
        (e: com.sun.net.httpserver.HttpExchange) => {
          val sb = new StringBuilder
          val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
          sb.append(s"# heap used=${heap.getUsed} committed=${heap.getCommitted} max=${heap.getMax}\n")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.toSeq.sortBy(_._1.getName).foreach { case (t, st) =>
            sb.append(s"\nthread ${t.getName} state=${t.getState}\n")
            st.foreach(f => sb.append(s"  at $f\n"))
          }
          val body = sb.toString.getBytes("UTF-8")
          e.sendResponseHeaders(200, body.length); e.getResponseBody.write(body); e.close()
        })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
      server.start()
    }

    private def valid(body: Array[Byte]): Boolean = {
      val raw = PromKernel.snappyUncompress(body)
      raw != null && PromKernel.decodeWriteRequest(raw) != null
    }

    /** BasicAuth username, null when absent/malformed (handlers.go:29-40). */
    private def authUser(e: com.sun.net.httpserver.HttpExchange): String =
      Option(e.getRequestHeaders.getFirst("Authorization"))
        .filter(_.startsWith("Basic "))
        .flatMap { h =>
          try {
            val dec = new String(java.util.Base64.getDecoder.decode(h.drop(6)), "UTF-8")
            Some(dec.takeWhile(_ != ':')).filter(_.nonEmpty)
          } catch { case _: Exception => None }
        }.orNull

    private def orgHeader(e: com.sun.net.httpserver.HttpExchange): String =
      e.getRequestHeaders.getFirst(graft.model.Model.TenantHeader)

    /** produce.go:124-181 synchronous handler: decode (400 on bad body),
      * count received per tenant, fan out to all writers concurrently, 200
      * iff every writer succeeded, else 500 whose body names the failures
      * ("Error sending samples to remote storages: a, b" — errSendingSamples
      * produce.go:23 + the %ss formatting at :175).
      */
    private def handleSync(exchange: com.sun.net.httpserver.HttpExchange,
        body: Array[Byte], ws: Seq[graft.streaming.Writers.RequestWriter]): Unit = {
      val raw = PromKernel.snappyUncompress(body)
      val req = if (raw == null) null else PromKernel.decodeWriteRequest(raw)
      if (req == null) { respond(exchange, 400); return }
      val tenant = {
        val a = authUser(exchange)
        if (a != null) a else { val o = orgHeader(exchange); if (o != null) o else "" }
      }
      val samples = graft.streaming.Writers.samplesOf(req)
      graft.streaming.Metrics.add("received_samples_total", samples.size.toLong,
        "tenant" -> tenant)
      val failed = graft.streaming.Writers.fanOut(ws, tenant, samples, writerTimeoutMs)
      if (failed.isEmpty) respond(exchange, 200)
      else respondBody(exchange, 500,
        s"Error sending samples to remote storages: ${failed.mkString(", ")}\n")
    }

    private def respond(e: com.sun.net.httpserver.HttpExchange, code: Int): Unit =
      e.sendResponseHeaders(code, -1)

    private def respondBody(e: com.sun.net.httpserver.HttpExchange,
        code: Int, msg: String): Unit = {
      val b = msg.getBytes("UTF-8")
      e.sendResponseHeaders(code, b.length)
      e.getResponseBody.write(b)
    }

    def latest: Long = seq.get()
    def range(from: Long, until: Long): Array[Received] =
      buf.subMap(from, until).values.toArray(Array.empty[Received])
    def commit(until: Long): Unit = buf.headMap(until).clear()
    def stop(): Unit = synchronized { if (server != null) { server.stop(0); server = null } }
  }

  private val receivers = new ConcurrentHashMap[Int, Receiver]()

  /** One receiver per port (one server can bind it). A second request for
    * the same port must ask for the SAME configuration — silently handing
    * back a server with a different path/host/validation than requested
    * would misroute a restarted query; fail fast instead (stop the old
    * receiver via [[shutdown]] to rebind with new settings).
    */
  def receiver(port: Int, path: String, validate: Boolean,
      maxConnectionAgeMs: Long = 0L, pprof: Boolean = true,
      host: String = "", telemetryPath: String = "/metrics"): Receiver = {
    val r = receivers.computeIfAbsent(port,
      _ => new Receiver(port, path, validate, maxConnectionAgeMs, pprof,
        host, telemetryPath))
    val requested = (port, path, validate, maxConnectionAgeMs, pprof, host, telemetryPath)
    if (r.config != requested)
      throw new IllegalStateException(
        s"port $port already serves a receiver with different settings " +
        s"(running: ${r.config}, requested: $requested); " +
        s"shutdown($port) first to rebind")
    r.start()
    r
  }

  def shutdown(port: Int): Unit = {
    val r = receivers.remove(port)
    if (r != null) r.stop()
  }
}

/** DataSource V2 provider (format class name). */
class HttpRemoteWriteProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpRemoteWriteSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpRemoteWriteTable(
      properties.getOrDefault("port", "9201").toInt,
      properties.getOrDefault("path", "/write"),
      properties.getOrDefault("validate", "true").toBoolean,
      properties.getOrDefault("maxConnectionAgeMs", "0").toLong,
      properties.getOrDefault("pprof", "true").toBoolean,
      properties.getOrDefault("host", ""),
      properties.getOrDefault("telemetryPath", "/metrics"))
}

class HttpRemoteWriteTable(port: Int, path: String, validate: Boolean,
    maxConnectionAgeMs: Long = 0L, pprof: Boolean = true,
    host: String = "", telemetryPath: String = "/metrics")
    extends Table with SupportsRead {
  override def name(): String = s"http-remote-write:$port$path"
  override def schema(): StructType = HttpRemoteWriteSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpRemoteWriteSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpRemoteWriteStream(port, path, validate, maxConnectionAgeMs, pprof,
            host, telemetryPath)
      }
    }
}

final case class HttpOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class HttpRemoteWriteStream(port: Int, path: String, validate: Boolean,
    maxConnectionAgeMs: Long = 0L, pprof: Boolean = true,
    host: String = "", telemetryPath: String = "/metrics")
    extends MicroBatchStream {
  private val receiver =
    HttpRemoteWriteSource.receiver(port, path, validate, maxConnectionAgeMs, pprof,
      host, telemetryPath)

  override def initialOffset(): Offset = HttpOffset(0L)
  override def latestOffset(): Offset = HttpOffset(receiver.latest)
  override def deserializeOffset(json: String): Offset = HttpOffset(json.toLong)
  override def commit(end: Offset): Unit =
    receiver.commit(end.asInstanceOf[HttpOffset].seq)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HttpOffset].seq
    val e = end.asInstanceOf[HttpOffset].seq
    if (e <= s) Array.empty
    else Array(HttpInputPartition(receiver.range(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val msgs = partition.asInstanceOf[HttpInputPartition].msgs
      private var i = -1
      override def next(): Boolean = { i += 1; i < msgs.length }
      override def get(): InternalRow = {
        val m = msgs(i)
        InternalRow(
          m.body,
          if (m.basicAuthUser == null) null else UTF8String.fromString(m.basicAuthUser),
          if (m.orgIdHeader == null) null else UTF8String.fromString(m.orgIdHeader),
          m.receivedAtMs)
      }
      override def close(): Unit = ()
    }
}

final case class HttpInputPartition(msgs: Array[HttpRemoteWriteSource.Received])
    extends InputPartition
