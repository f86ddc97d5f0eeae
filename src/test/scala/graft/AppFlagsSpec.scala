package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpRemoteWriteSource

/** Reference flag-surface parity (pkg/app/app.go:60-67 web flags,
  * pkg/app/pulsar.go:161-167 serializer flag): each reference-spelled flag
  * must drive the same behavior as this CLI's historical shorthand.
  */
class AppFlagsSpec extends AnyFunSuite {

  test("--pulsar.serializer is the reference spelling; --serializer the alias") {
    assert(App.serializerOf(Array("--pulsar.serializer", "avro-json-compat")) ==
      "avro-json-compat")
    assert(App.serializerOf(Array("--serializer", "json-compat")) == "json-compat")
    // reference spelling wins when both appear
    assert(App.serializerOf(Array(
      "--serializer", "json", "--pulsar.serializer", "json-compat")) == "json-compat")
    assert(App.serializerOf(Array.empty) == "json")
  }

  test("--web.listen-address parses host:port; :port binds all interfaces") {
    assert(App.parseListenAddress("127.0.0.1:9201") == ("127.0.0.1", 9201))
    assert(App.parseListenAddress(":9201") == ("", 9201))
    val e = intercept[IllegalArgumentException](App.parseListenAddress("9201"))
    assert(e.getMessage.contains("web.listen-address"))
    assert(intercept[IllegalArgumentException](
      App.parseListenAddress("host:")).getMessage.contains("host:"))
  }

  test("--web.telemetry-path relocates the metrics endpoint; host binding works") {
    val port = 19321
    val r = HttpRemoteWriteSource.receiver(port, "/write", validate = true,
      host = "127.0.0.1", telemetryPath = "/tele/metrics")
    try {
      def get(path: String): Int = {
        val c = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try c.getResponseCode finally c.disconnect()
      }
      assert(get("/tele/metrics") == 200)
      assert(get("/ready") == 200)
      // the default path is NOT registered when relocated
      assert(get("/metrics") == 404)
    } finally HttpRemoteWriteSource.shutdown(port)
  }
}
