package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PromKernel
import graft.functions.PromKernel._

/** Golden vectors transcribed from the reference's own test suite
  * (pkg/pulsar/serializers_test.go — see FIXTURES.md). These are the primary
  * correctness oracle for the serializer kernel.
  */
class PromKernelSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private def jsonEq(a: String, b: String): Boolean = om.readTree(a) == om.readTree(b)

  // fixtures: labels sorted by key, as the serializers expect
  private val keys = Array("__name__", "labelfoo")
  private val vals = Array("foo", "label-bar")

  // --- float / time formatting ---------------------------------------------

  test("valueString matches Go FormatFloat('f',-1)") {
    assert(valueString(456.0) == "456")
    assert(valueString(Double.PositiveInfinity) == "+Inf")
    assert(valueString(Double.NegativeInfinity) == "-Inf")
    assert(valueString(Double.NaN) == "NaN")
    assert(valueString(0.0) == "0")
    assert(valueString(-0.0) == "-0")
    assert(valueString(10.001) == "10.001")
    assert(valueString(0.1) == "0.1")
    assert(valueString(1e21) == "1000000000000000000000")
    assert(valueString(1e-7) == "0.0000001")
    assert(valueString(-123.456) == "-123.456")
  }

  test("secondsString: ms -> fractional seconds, shortest") {
    assert(secondsString(0L) == "0")
    assert(secondsString(10001L) == "10.001")
    assert(secondsString(10100L) == "10.1")
    assert(secondsString(1704067798778L) == "1704067798.778")
    assert(secondsString(-500L) == "-0.5")
  }

  test("rfc3339Nano golden (serializers_test.go:158)") {
    assert(rfc3339Nano(0L) == "1970-01-01T00:00:00Z")
    assert(rfc3339Nano(10001L) == "1970-01-01T00:00:10.001Z")
    assert(rfc3339Nano(10100L) == "1970-01-01T00:00:10.1Z")
    assert(rfc3339Nano(1704067798778L) == "2024-01-01T00:09:58.778Z")
  }

  test("rfc3339 parse inverse + sub-ms truncation (serializers.go:55)") {
    assert(parseRfc3339ToMs("1970-01-01T00:00:10.001Z") == 10001L)
    assert(parseRfc3339ToMs("2024-01-01T00:09:58.778549Z") == 1704067798778L)
    assert(parseRfc3339ToMs("1970-01-01T01:00:00+01:00") == 0L)
    intercept[Exception](parseRfc3339ToMs("not-a-time"))
  }

  test("parseSecondsToMs exact decimal") {
    assert(parseSecondsToMs("0") == 0L)
    assert(parseSecondsToMs("10.001") == 10001L)
    assert(parseSecondsToMs("10.1") == 10100L)
    assert(parseSecondsToMs("-0.5") == -500L)
  }

  // --- serializer golden vectors (serializers_test.go:39-236) ---------------

  test("json serializer golden vectors") {
    assert(promJson(0L, 456.0, keys, vals, "")
      == """{"value":[0,"456"],"metric":{"__name__":"foo","labelfoo":"label-bar"}}""")
    assert(promJson(10001L, Double.PositiveInfinity, keys, vals, "")
      == """{"value":[10.001,"+Inf"],"metric":{"__name__":"foo","labelfoo":"label-bar"}}""")
    assert(promJson(0L, 456.0, keys, vals, "fake")
      == """{"value":[0,"456"],"metric":{"__name__":"foo","labelfoo":"label-bar"},"tenant_id":"fake"}""")
    // empty labels: metric omitted entirely (omitempty)
    assert(promJson(0L, 1.0, Array.empty, Array.empty, "") == """{"value":[0,"1"]}""")
  }

  test("json-compat serializer golden vectors (JSON-equality)") {
    assert(jsonEq(compatJson(0L, 456.0, keys, vals, "", avroMode = false),
      """{"value":"456","timestamp":"1970-01-01T00:00:00Z","name":"foo","labels":{"__name__":"foo","labelfoo":"label-bar"}}"""))
    assert(jsonEq(compatJson(10001L, Double.PositiveInfinity, keys, vals, "", avroMode = false),
      """{"value":"+Inf","timestamp":"1970-01-01T00:00:10.001Z","name":"foo","labels":{"__name__":"foo","labelfoo":"label-bar"}}"""))
    assert(jsonEq(compatJson(0L, 456.0, keys, vals, "fake", avroMode = false),
      """{"value":"456","timestamp":"1970-01-01T00:00:00Z","name":"foo","labels":{"__name__":"foo","labelfoo":"label-bar"},"tenant_id":"fake"}"""))
    // tenant_id key absent when "" (serializers.go:76-78)
    assert(!compatJson(0L, 456.0, keys, vals, "", avroMode = false).contains("tenant_id"))
  }

  test("avro-json-compat golden: tenant_id always present with default \"\"") {
    assert(jsonEq(compatJson(0L, 456.0, keys, vals, "", avroMode = true),
      """{"value":"456","timestamp":"1970-01-01T00:00:00Z","name":"foo","labels":{"__name__":"foo","labelfoo":"label-bar"},"tenant_id":""}"""))
    assert(compatJson(0L, 456.0, keys, vals, "", avroMode = true).contains("\"tenant_id\":\"\""))
  }

  // --- deserializers + name backfill (serializers_test.go:71-140) -----------

  test("json unmarshal round-trips") {
    for (t <- Seq("", "fake"); v <- Seq(456.0, Double.PositiveInfinity); ms <- Seq(0L, 10001L)) {
      val s = promJson(ms, v, keys, vals, t)
      val p = parsePromJson(s)
      assert(p != null)
      assert(p.timestampMs == ms && p.value == v && p.tenantId == t)
      assert(p.labelKeys.sorted.sameElements(keys))
    }
    assert(parsePromJson("""{nope""") == null)
  }

  test("compat unmarshal with __name__ backfill (serializers.go:49-51)") {
    // __name__ missing from labels but name present => injected
    val p1 = parseCompatJson(
      """{"value":"456","timestamp":"1970-01-01T00:00:00Z","name":"foo","labels":{"labelfoo":"label-bar"}}""")
    assert(p1.labelKeys.contains("__name__"))
    assert(p1.labelValues(p1.labelKeys.indexOf("__name__")) == "foo")
    // name missing but __name__ present => fine, no change
    val p2 = parseCompatJson(
      """{"value":"456","timestamp":"1970-01-01T00:00:00Z","labels":{"__name__":"foo"}}""")
    assert(p2.labelKeys.count(_ == "__name__") == 1)
    // tenant_id "" => empty tenant
    val p3 = parseCompatJson(
      """{"value":"1","timestamp":"1970-01-01T00:00:00Z","name":"x","labels":{},"tenant_id":""}""")
    assert(p3.tenantId == "")
    assert(parseCompatJson("""{"timestamp":"nope"}""") == null)
  }

  test("compat round-trips through serializer") {
    val s = compatJson(10001L, 456.0, keys, vals, "fake", avroMode = false)
    val p = parseCompatJson(s)
    assert(p.timestampMs == 10001L && p.value == 456.0 && p.tenantId == "fake")
  }

  // --- partition key (serializers_test.go:246-291) --------------------------

  private val replica = Array("replica")

  test("partition key: deterministic") {
    val a = seriesKey(keys, vals, "", replica)
    val b = seriesKey(keys, vals, "", replica)
    assert(a == b)
    assert(a.startsWith("hex ") && a.length == "hex ".length + 16)
  }

  test("partition key: sensitive to labels") {
    val a = seriesKey(Array("__name__", "count"), Array("foo", "1"), "", replica)
    val b = seriesKey(Array("__name__", "count"), Array("foo", "2"), "", replica)
    assert(a != b)
  }

  test("partition key: invariant across replica label values (HA dedup)") {
    val a = seriesKey(Array("__name__", "replica"), Array("foo", "a"), "", replica)
    val b = seriesKey(Array("__name__", "replica"), Array("foo", "b"), "", replica)
    val c = seriesKey(Array("__name__"), Array("foo"), "", replica)
    assert(a == b && a == c)
  }

  test("partition key: sensitive to tenant") {
    assert(seriesKey(keys, vals, "", replica) != seriesKey(keys, vals, "tenant1", replica))
  }

  test("partition key: FNV-1 64 byte-compat pin") {
    // fnv.New64() over "abc" == 0xd8dcca186bafadcb (known FNV-1 64 vector)
    var h = 0xcbf29ce484222325L
    for (b <- "abc".getBytes) { h = h * 0x100000001b3L; h = h ^ (b & 0xffL) }
    assert(String.format("%016x", java.lang.Long.valueOf(h)) == "d8dcca186bafadcb")
    // full seriesKey of one label {a:b} == fnv1_64("ab"), order: key then value
    var h2 = 0xcbf29ce484222325L
    for (b <- "ab".getBytes) { h2 = h2 * 0x100000001b3L; h2 = h2 ^ (b & 0xffL) }
    assert(seriesKey(Array("a"), Array("b"), "", Array.empty)
      == String.format("hex %016x", java.lang.Long.valueOf(h2)))
  }

  test("partition key: unsorted input keys are sorted before hashing") {
    val a = seriesKey(Array("b", "a"), Array("2", "1"), "t", Array.empty)
    val b = seriesKey(Array("a", "b"), Array("1", "2"), "t", Array.empty)
    assert(a == b)
  }

  // --- snappy + prompb wire codec ------------------------------------------

  test("snappy round-trip; corrupt input -> null") {
    val data = "hello prometheus pulsar remote write".getBytes
    val enc = snappyCompress(data)
    assert(snappyUncompress(enc).sameElements(data))
    assert(snappyUncompress(Array[Byte](1, 2, 3)) == null)
  }

  test("prompb wire codec round-trip") {
    val req = PbWriteRequest(Seq(
      PbTimeSeries(
        Seq(PbLabel("__name__", "node_cpu_seconds_total"), PbLabel("cpu", "0")),
        Seq(PbSample(0.5, 1704067798778L), PbSample(0.0, 0L))),
      PbTimeSeries(Seq(PbLabel("__name__", "up")), Seq(PbSample(1.0, -1L)))))
    val bytes = encodeWriteRequest(req)
    val back = decodeWriteRequest(bytes)
    assert(back == req)
    assert(decodeWriteRequest("garbage!".getBytes) == null)
    // proto3 zero-omission: empty sample encodes to zero bytes inside its frame
    val z = encodeWriteRequest(PbWriteRequest(Seq(PbTimeSeries(Nil, Seq(PbSample(0.0, 0L))))))
    assert(decodeWriteRequest(z) == PbWriteRequest(Seq(PbTimeSeries(Nil, Seq(PbSample(0.0, 0L))))))
  }

  test("fingerprint64 deterministic + SQL-parity formula") {
    val s = "hello"
    var h = 0L
    for (b <- s.getBytes) h = h * 31L + (b & 0xffL)
    assert(fingerprint64(s) == h)
  }

  test("simhash64 matches the exploded-token md5-nibble formulation") {
    // independent reference: per token, md5 hex chars -> nibbles -> 64 bit
    // votes, strict >0 output (the d09 oracle's exact arithmetic)
    def reference(text: String): String = {
      val counters = new Array[Int](64)
      for (t <- text.split(" ", -1)) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        for (j <- 0 until 64) {
          val nib = Integer.parseInt(hex((j / 4)).toString, 16)
          val bit = (nib >> (3 - (j % 4))) & 1
          counters(j) += bit * 2 - 1
        }
      }
      counters.map(c => if (c > 0) '1' else '0').mkString
    }
    for (s <- Seq("the quick brown fox", "a", "", "x  y", "unicode éü token"))
      assert(simhash64(s) == reference(s), s"mismatch for '$s'")
    assert(simhash64("abc abc abc").length == 64)
  }
}
