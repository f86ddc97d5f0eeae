package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The BPE greedy-merge fold (DataQueries9.mergePair) against an imperative
  * reference implementation of left-to-right greedy pair merging — the
  * subtle cases are self-overlapping pairs ("aaa" under (a,a) must become
  * [aa, a], "aaaa" [aa, aa]) and merges that re-expose the pair's first
  * symbol. The fold's correctness carries d76/d80's training loop.
  */
class BpeMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Canonical left-to-right greedy merge: scan, fuse (a, b) pairs, skip
    * past each fuse.
    */
  private def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("mergePair fold matches the imperative greedy merge on adversarial + random words") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab" // tiny alphabet maximizes self-overlap collisions
    val words =
      Seq("aaa", "aaaa", "aab", "abb", "abab", "aabb", "bbaa", "ababa", "a", "ab") ++
        Seq.fill(300)((0 until (1 + rnd.nextInt(12)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length)).toString).mkString)
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    for ((a, b) <- pairs) {
      val df = words.toDF("w")
        .select(col("w"),
          org.apache.spark.sql.functions.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
        .select(col("w"),
          graft.queries.DataQueries9.mergePair(col("syms"), a, b).as("m"))
      val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        val expect = greedy(w.map(_.toString).toVector, a, b)
        assert(got(w) == expect,
          s"word '$w' pair ($a,$b): got ${got(w)} expected $expect")
      }
    }
  }
}
