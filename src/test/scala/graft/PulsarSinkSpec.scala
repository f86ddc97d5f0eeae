package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PulsarSink

/** Pulsar adapter config plumbing (pkg/app/pulsar.go:74-115) — parse,
  * validation, and factory selection, all without a live broker.
  */
class PulsarSinkSpec extends AnyFunSuite {

  test("flags parse with the reference's names and defaults") {
    val cfg = PulsarSink.fromArgs(Array(
      "--pulsar.url", "pulsar+ssl://pulsar-proxy:6651",
      "--pulsar.topic", "metrics-tls",
      "--pulsar.connection-timeout", "5s",
      "--pulsar.certificate-authority", "/etc/ca.pem",
      "--pulsar.client-certificate", "/etc/crt.pem",
      "--pulsar.client-key", "/etc/key.pem",
      "--pulsar.insecure-skip-tls-verify", "true",
      "--pulsar.max-connections-per-broker", "4"))
    assert(cfg.url == "pulsar+ssl://pulsar-proxy:6651")
    assert(cfg.topic == "metrics-tls")
    assert(cfg.connectionTimeoutMs == 5000L)
    assert(cfg.certificateAuthority == "/etc/ca.pem")
    assert(cfg.clientCertificate == "/etc/crt.pem")
    assert(cfg.clientKey == "/etc/key.pem")
    assert(cfg.insecureSkipTlsVerify)
    assert(!cfg.insecureSkipTlsValidateHostname)
    assert(cfg.maxConnectionsPerBroker == 4)
    // defaults (pulsar.go:74-93)
    val d = PulsarSink.fromArgs(Array.empty)
    assert(d.url == "" && d.topic == "metrics" && d.connectionTimeoutMs == 30000L
      && d.maxConnectionsPerBroker == 1 && !d.insecureSkipTlsVerify)
  }

  test("duration literals: kingpin formats") {
    assert(PulsarSink.parseDurationMs("30s") == 30000L)
    assert(PulsarSink.parseDurationMs("500ms") == 500L)
    assert(PulsarSink.parseDurationMs("2m") == 120000L)
    assert(PulsarSink.parseDurationMs("1h") == 3600000L)
    assert(PulsarSink.parseDurationMs("250") == 250L)
  }

  test("TLS auth requires both key and certificate (pulsar.go:97-103)") {
    val e = intercept[IllegalArgumentException] {
      PulsarSink.fromArgs(Array("--pulsar.client-key", "/etc/key.pem"))
    }
    assert(e.getMessage.contains("both pulsar.client-key and pulsar.client-certificate"))
    intercept[IllegalArgumentException] {
      PulsarSink.Config(clientCertificate = "/etc/crt.pem").validated
    }
  }

  test("factory fails fast without pulsar-client on the classpath") {
    val f = new PulsarSink.Factory(PulsarSink.Config(url = "pulsar://localhost:6650"))
    val e = intercept[IllegalStateException](f.create(0L))
    assert(e.getMessage.contains("pulsar-client is not on the classpath"))
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }
}
