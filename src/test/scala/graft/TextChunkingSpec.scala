package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextChunking

/** Fixed-window chunking edge cases and the coverage invariant. */
class TextChunkingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("short, exact-width and boundary texts chunk correctly (w=10, s=7)") {
    val out = TextChunking.chunkFixed(df(
        1L -> "abc",          // shorter than width -> 1 chunk
        2L -> "0123456789",   // exactly width -> 1 chunk
        3L -> "01234567890",  // width+1 -> 2 chunks (tail of 4)
        4L -> ""              // empty -> 1 empty chunk
      ), "id", "text", 10, 7)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 3L, "abc"),
      (2L, 0L, 1L, 10L, "0123456789"),
      (3L, 0L, 1L, 10L, "0123456789"),
      (3L, 1L, 8L, 4L, "7890"),
      (4L, 0L, 1L, 0L, "")), out.mkString(","))
  }

  test("every position is covered and overlaps are exactly width - stride") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = TextChunking.chunkFixed(df(9L -> text), "id", "text", 64, 48)
      .orderBy("chunk_idx").collect()
    val covered = chunks.map(r => (r.getLong(2), r.getLong(2) + r.getLong(3) - 1))
    assert(covered.head._1 == 1L && covered.last._2 == text.length.toLong)
    covered.sliding(2).foreach { case Array((s1, e1), (s2, _)) =>
      assert(s2 == s1 + 48, "starts must step by stride")
      assert(s2 <= e1 + 1, "no gaps between consecutive chunks")
    }
    // reassembling the non-overlapping prefixes restores the text
    val rebuilt = chunks.map(_.getString(4)).zipWithIndex.map {
      case (c, i) => if (i == chunks.length - 1) c else c.take(48)
    }.mkString
    assert(rebuilt == text)
  }

  test("stride must be positive and no larger than width") {
    intercept[IllegalArgumentException](
      TextChunking.chunkFixed(df(1L -> "x"), "id", "text", 10, 11))
    intercept[IllegalArgumentException](
      TextChunking.chunkFixed(df(1L -> "x"), "id", "text", 10, 0))
  }
}
