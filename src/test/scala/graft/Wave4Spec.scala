package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the wave-4 operators (the oracle gate pins exact values;
  * these pin the semantic guarantees that hold at any scale factor).
  */
class Wave4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d24 SRP signatures are 16-bit and bucket counts are consistent") {
    val rows = q("d24_srp_lsh").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("sig").length == 16))
    // bucket_n must equal the actual multiplicity of the signature
    val bySig = rows.groupBy(_.getAs[String]("sig"))
    assert(rows.forall(r => bySig(r.getAs[String]("sig")).length == r.getAs[Long]("bucket_n")))
  }

  test("d27 quantized codes stay within int8 range") {
    val qs = q("d27_quantize").collect().flatMap(_.getAs[String]("q").split(",")).map(_.toLong)
    assert(qs.nonEmpty && qs.forall(v => v >= -128 && v <= 127))
    assert(qs.max == 127) // the max-|x| component always hits full scale
  }

  test("d26 length band keeps ~90% of the corpus") {
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    val kept = q("d26_length_band").count()
    assert(kept >= (total * 0.85).toLong && kept <= total)
  }

  test("d29 stratified sample: at most 3 per stratum, hashes ascending") {
    val rows = q("d29_strat_sample").collect()
    val byGroup = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
    assert(byGroup.values.forall(_.length <= 3))
    byGroup.values.foreach { g =>
      val hs = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[String]("h")).toSeq
      assert(hs == hs.sorted)
    }
  }

  test("d30 mixing equalizes language shares within hash noise") {
    val shares = q("d30_mix").groupBy("lang").count().collect()
      .map(_.getAs[Long]("count"))
    assert(shares.length >= 2)
    // every language lands within a generous band of the smallest share
    assert(shares.max <= shares.min * 2)
  }

  test("d31 z-values are within 20 bits and distinct dims interleave") {
    val rows = q("d31_zorder").collect()
    assert(rows.forall(r => r.getAs[Long]("z") >= 0 && r.getAs[Long]("z") < (1L << 20)))
  }

  test("d25 posting lists are sorted ascending and bounded at 10") {
    val rows = q("d25_inverted_index").collect()
    rows.foreach { r =>
      val ids = r.getAs[String]("posting10").split(",").map(_.toLong).toSeq
      assert(ids.length <= 10 && ids == ids.sorted)
      assert(r.getAs[Long]("df") >= ids.length)
    }
  }

  test("shingle_g kernel equals the expression-chain definition") {
    import org.apache.spark.sql.Column
    def chain(w: Column, n: Int): Column =
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    Seq(3, 5).foreach { n =>
      val cmp = docs
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          sort_array(when(size(col("w")) >= n,
            transform(chain(col("w"), n),
              sh => conv(substring(md5(sh), 1, 15), 16, 10).cast("long")))
            .otherwise(array().cast("array<long>"))).as("expect"),
          sort_array(graft.functions.prom.shingle_g(col("text"), n)).as("got"))
        .filter(not(col("expect") <=> col("got")))
      assert(cmp.isEmpty, s"n=$n mismatch: " + cmp.head(3).mkString(";"))
    }
  }

  test("shingle kernels: edge cases (short, empty, repeated, unicode)") {
    import graft.functions.PromKernel
    assert(PromKernel.shingleG("", 3).isEmpty)
    assert(PromKernel.shingleG("one two", 3).isEmpty)
    assert(PromKernel.shingleG("a b c", 3).length == 1)
    // repeats collapse in shingleG, stay in ngramG
    assert(PromKernel.shingleG("x y x y x y", 2).length == 2)
    assert(PromKernel.ngramG("x y x y x y", 2).length == 5)
    // unicode goes through UTF-8 like Spark's md5(string): pin against the
    // expression-chain value computed by Spark itself
    val s = spark
    import s.implicits._
    val uni = Seq("héllo wörld ünïcode δ ж 中文 test").toDF("text")
    val fromChain = uni.select(
      explode(transform(sequence(lit(0), size(split(col("text"), " ")) - 3),
        i => conv(substring(md5(
          concat_ws(" ", slice(split(col("text"), " "), i + 1, lit(3)))), 1, 15), 16, 10)
          .cast("long")))).collect().map(_.getLong(0)).toSet
    val fromKernel = uni.select(explode(graft.functions.prom.shingle_g(col("text"), 3)))
      .collect().map(_.getLong(0)).toSet
    assert(fromKernel == fromChain)
  }

  test("d23 contamination never flags the benchmark source itself") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val flagged = q("d23_contamination").collect().map(_.getAs[Long]("doc_id"))
    assert(flagged.forall(id => !docs.contains(id)))
  }
}
