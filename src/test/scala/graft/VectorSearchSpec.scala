package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorSearch

/** The public embedding-similarity API on synthetic vectors. */
class VectorSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 64-dim vectors: 0 and 1 near-identical, 2 orthogonal-ish, 3 = -v0
  private def vectors = {
    val s = spark
    import s.implicits._
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.001f
    val orth = Array.tabulate(64)(i => (if (i % 2 == 0) 1f else -1f) * math.cos(3 * i + 2).toFloat)
    val neg = base.map(x => -x)
    Seq((0L, base), (1L, near), (2L, orth), (3L, neg)).toDF("vid", "vec")
  }

  test("bruteForceTopK ranks the near-duplicate first, negation last") {
    // the predicate names the CALLER's id column, not the internal rename
    val top = VectorSearch.bruteForceTopK(vectors, "vid", "vec", col("vid") === 0L, 3)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L), top.mkString(","))
    assert(top.head.getDouble(3) > 0.999)
    assert(top.last.getDouble(3) < -0.999)
  }

  test("srpCandidates pairs the near-identical vectors; cosineVerify confirms") {
    val cand = VectorSearch.srpCandidates(vectors, "vid", "vec")
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), pairs) // identical signatures share every band
    assert(!pairs.contains((0L, 3L)), pairs) // negation flips every bit
    val cos = VectorSearch.cosineVerify(cand, vectors, "vid", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cos((0L, 1L)) > 0.999)
  }

  test("semanticDedup keeps the min-id representative of a near-dup pair") {
    // two one-centroid cells: 0/1 near-identical land together, 3 (= -v0)
    // lands in its own cell; 2 rides whichever is closer
    val assigned = VectorSearch.ivfAssign(vectors, "vid", "vec",
      vectors.filter(col("vid") === 0L || col("vid") === 3L), "vid", "vec")
    val kept = VectorSearch.semanticDedup(assigned, 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept(0L), "min-id of the near-dup pair must survive")
    assert(!kept(1L), "its cosine-0.999 twin must be dropped")
    assert(kept(2L) && kept(3L), "non-duplicates survive: " + kept)
    assert(kept.size == 4, "every input vector gets a verdict row")
  }

  test("bands must divide the plane count") {
    intercept[IllegalArgumentException](
      VectorSearch.srpCandidates(vectors, "vid", "vec", bands = 3))
  }
}
