package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** The public deterministic sampling API. The load-bearing property is the
  * documented one: the sample / split / mix decisions hash DISJOINT md5
  * substring windows (1-8 / 9-13 / 14-18), so composing any two of them on
  * the SAME id column selects independently — the composed keep-rate is the
  * product of the individual rates, not a correlated subset.
  */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 20k ids over two strata: "b" every 5th id (4000 rows), "a" the rest
  // (16000). mixToSmallest keeps stratum "a" at ~4000/16000 = 1/4.
  private def corpus = spark.range(20000).select(
    col("id").as("doc_id"),
    when(col("id") % 5 === 0, "b").otherwise("a").as("lang"))

  test("hashSample keeps ~1/mod of rows, deterministically") {
    val n = Sampling.hashSample(corpus, "doc_id", 4).count()
    assert(math.abs(n - 5000L) < 300, s"expected ~5000 of 20000, got $n")
    val again = Sampling.hashSample(corpus, "doc_id", 4).count()
    assert(n == again, "hash sampling must be reproducible")
  }

  test("mixToSmallest equalizes strata to ~the smallest stratum") {
    val m = Sampling.mixToSmallest(corpus, "lang", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("b") == 4000L, s"smallest stratum keeps everything: $m")
    assert(math.abs(m("a") - 4000L) < 300, s"stratum a down-samples to ~4000: $m")
  }

  test("withTrainValSplit tags ~1/20 as val") {
    val v = Sampling.withTrainValSplit(corpus, "doc_id")
      .filter(col("split") === "val").count()
    assert(math.abs(v - 1000L) < 150, s"expected ~1000 of 20000, got $v")
  }

  test("sample and mix decisions on the same id column are independent") {
    // decide each independently over the full corpus, then intersect on
    // stratum "a" (the down-sampled one): P(sample AND mix) must equal
    // P(sample) * P(mix). With overlapping hash windows (the pre-round-7
    // bug: mix read a prefix of sample's window) the intersection is a
    // correlated subset and this product law breaks.
    val a = corpus.filter(col("lang") === "a")
    val nA = a.count().toDouble
    val sampled = Sampling.hashSample(corpus, "doc_id", 4)
      .filter(col("lang") === "a").select("doc_id")
    val mixed = Sampling.mixToSmallest(corpus, "lang", "doc_id")
      .filter(col("lang") === "a").select("doc_id")
    val pS = sampled.count() / nA
    val pM = mixed.count() / nA
    val both = sampled.join(mixed, "doc_id").count() / nA
    val expected = pS * pM
    assert(math.abs(both - expected) < 0.012,
      f"P(both)=$both%.4f vs P(s)*P(m)=$expected%.4f (pS=$pS%.4f pM=$pM%.4f)")
  }

  test("split and mix decisions on the same id column are independent") {
    val a = corpus.filter(col("lang") === "a")
    val nA = a.count().toDouble
    val vIds = Sampling.withTrainValSplit(corpus, "doc_id")
      .filter(col("split") === "val" && col("lang") === "a").select("doc_id")
    val mixed = Sampling.mixToSmallest(corpus, "lang", "doc_id")
      .filter(col("lang") === "a").select("doc_id")
    val pV = vIds.count() / nA
    val pM = mixed.count() / nA
    val both = vIds.join(mixed, "doc_id").count() / nA
    assert(math.abs(both - pV * pM) < 0.012,
      f"P(both)=$both%.4f vs P(v)*P(m)=${pV * pM}%.4f")
  }
}
