package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-13 queries (d134+). The oracle gate pins exact
  * values at sf0.01; these pin the cross-query guarantees — the banded
  * decontamination path agrees with its own exact baseline, and residual
  * PQ actually buys recall at the same code budget.
  */
class Wave7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d134 exact side IS d126's answer (same NN, same score, per query)") {
    val d126 = q("d126_semantic_decon")
      .select(col("qid"), col("nn_id").as("nn126"), col("cos_q6").as("cos126"))
    val d134 = q("d134_banded_decon")
      .select(col("qid"), col("nn_id"), col("cos_q6"))
    val joined = d134.join(d126, Seq("qid"), "full")
    assert(joined.filter(col("nn_id").isNull || col("nn126").isNull ||
      col("nn_id") =!= col("nn126") || col("cos_q6") =!= col("cos126")).count() == 0,
      "banded query's exact baseline must be byte-identical to d126")
  }

  test("d134 banded hit implies the banded NN equals the exact NN") {
    val rows = q("d134_banded_decon")
      .select("nn_id", "band_nn_id", "hit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hit = r.getBoolean(2)
      val agree = !r.isNullAt(1) && r.getLong(0) == r.getLong(1)
      assert(hit == agree, s"hit flag inconsistent: $r")
    }
    // the banded path must find the true NN for a nontrivial share of
    // queries at this config (measured 10/25 at sf0.001; pin > 0 so a
    // banding regression to zero recall cannot land silently)
    assert(rows.count(_.getBoolean(2)) > 0)
  }

  test("d135: residual ADC recall@3 >= raw ADC recall@3 at the same code budget") {
    val r = q("d135_residual_pq")
      .agg(sum("hits_raw").cast("long"), sum("hits_res").cast("long"),
        min("k").cast("long"), max("k").cast("long")).head()
    val (raw, res) = (r.getLong(0), r.getLong(1))
    assert(r.getLong(2) == 3 && r.getLong(3) == 3, "exact top-3 must have k=3")
    assert(res >= raw, s"residual PQ must not lose to raw PQ: raw=$raw res=$res")
    assert(res > 0, "residual arm must recover at least one true neighbor")
  }
}
