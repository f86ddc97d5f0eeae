package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The engine's functions reachable from plain SQL. */
class SqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()

  test("registered SQL functions run the same kernels") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  prom_value_string(456.0d) AS vs,
        |  prom_seconds_string(10001L) AS ss,
        |  prom_rfc3339(10001L) AS ts,
        |  prom_parse_rfc3339('1970-01-01T00:00:10.001Z') AS ms,
        |  prom_json(0L, 456.0d, map('__name__', 'foo'), '') AS pj,
        |  prom_series_key(map('__name__', 'foo', '__replica__', 'a'), '') AS k1,
        |  prom_series_key(map('__name__', 'foo', '__replica__', 'b'), '') AS k2,
        |  cast(snappy_uncompress(snappy_compress(cast('hi' as binary))) as string) AS roundtrip,
        |  fingerprint64('hello') AS fp,
        |  prom_deserialize(prom_json(10001L, 1.5d, map('__name__', 'x'), 'org')).tenantId AS t
        |""".stripMargin).collect().head
    assert(row.getAs[String]("vs") == "456")
    assert(row.getAs[String]("ss") == "10.001")
    assert(row.getAs[String]("ts") == "1970-01-01T00:00:10.001Z")
    assert(row.getAs[Long]("ms") == 10001L)
    assert(row.getAs[String]("pj") == """{"value":[0,"456"],"metric":{"__name__":"foo"}}""")
    assert(row.getAs[String]("k1") == row.getAs[String]("k2"))
    assert(row.getAs[String]("roundtrip") == "hi")
    assert(row.getAs[Long]("fp") == graft.functions.PromKernel.fingerprint64("hello"))
    assert(row.getAs[String]("t") == "org")
  }

  test("shingle kernels reachable from SQL match the Scala kernels") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT shingle_g('a b c d a b c d', 3) AS sg,
        |       ngram_g('a b c d a b c d', 2) AS ng""".stripMargin).collect().head
    val sg = row.getSeq[Long](row.fieldIndex("sg")).toList
    val ng = row.getSeq[Long](row.fieldIndex("ng")).toList
    assert(sg == graft.functions.PromKernel.shingleG("a b c d a b c d", 3).toList)
    assert(ng == graft.functions.PromKernel.ngramG("a b c d a b c d", 2).toList)
    // distinct vs with-repeats: the repeated "a b c"/"b c d" shingles
    // collapse in shingle_g but stay in ngram_g
    assert(sg.distinct == sg)
    assert(ng.length == 7)
  }

  test("vec_dot from SQL: fold-ordered dot product") {
    val d = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(d == 32.0)
  }

  test("hamming64 and next_fit_bins reachable from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT hamming64('0011', '0101') AS h,
        |       next_fit_bins(array(60L, 60L, 50L, 30L), 100L, 0L) AS bins,
        |       next_fit_bins(array(10L, 10L, 10L), 100L, 2L) AS capped""".stripMargin)
      .collect().head
    assert(row.getLong(row.fieldIndex("h")) == 2L)
    assert(row.getSeq[Long](row.fieldIndex("bins")).toList == List(0L, 1L, 2L, 2L))
    assert(row.getSeq[Long](row.fieldIndex("capped")).toList == List(0L, 0L, 1L))
  }
}
