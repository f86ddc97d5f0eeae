package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PromKernel

/** Property-based checks for the partition key and fingerprint kernels —
  * the properties the reference asserts by example (serializers_test.go:
  * 246-291: deterministic, label-sensitive, replica-invariant,
  * tenant-sensitive), generalized over generated inputs.
  */
class KeyPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val labelName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val labelMap: Gen[Map[String, String]] =
    Gen.nonEmptyMap(Gen.zip(labelName, labelName))
  private val replicas = Array("__replica__")

  private def key(m: Map[String, String], tenant: String): String = {
    val ks = m.keys.toArray
    PromKernel.seriesKey(ks, ks.map(m), tenant, replicas)
  }

  test("series key is deterministic and label-order independent") {
    check(Prop.forAll(labelMap, labelName) { (m, t) =>
      val rev = m.toSeq.reverse
      key(m, t) == key(m, t) &&
        PromKernel.seriesKey(rev.map(_._1).toArray, rev.map(_._2).toArray, t, replicas) == key(m, t)
    })
  }

  test("series key is invariant to replica label values") {
    check(Prop.forAll(labelMap, labelName, labelName) { (m, t, replicaValue) =>
      val base = m - "__replica__"
      key(base + ("__replica__" -> replicaValue), t) == key(base, t)
    })
  }

  test("series key separates tenants") {
    check(Prop.forAll(labelMap, labelName) { (m, t) =>
      key(m, t) != key(m, t + "x")
    })
  }

  test("series key format is 'hex %016x'") {
    check(Prop.forAll(labelMap, labelName) { (m, t) =>
      key(m, t).matches("hex [0-9a-f]{16}")
    })
  }

  test("simhash64 is deterministic and 64 bits of 0/1") {
    check(Prop.forAll(Gen.nonEmptyListOf(labelName)) { tokens =>
      val text = tokens.mkString(" ")
      val h = PromKernel.simhash64(text)
      h == PromKernel.simhash64(text) &&
        h.length == 64 && h.forall(c => c == '0' || c == '1')
    })
  }

  test("fingerprint64: appending a different byte always changes the hash") {
    check(Prop.forAll(labelName, Gen.alphaNumChar, Gen.alphaNumChar) { (s, a, b) =>
      a == b || PromKernel.fingerprint64(s + a) != PromKernel.fingerprint64(s + b)
    })
  }

  test("hamming64 kernel equals the naive per-position count") {
    val bits: Gen[String] = Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)
    check(Prop.forAll(bits, bits) { (a, b) =>
      val naive = a.zip(b).count { case (x, y) => x != y }.toLong
      graft.functions.PromCatalyst.hamming64(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) == naive
    })
  }
}
