package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-min sketch hashing shared by the batch audit (q47) and the
  * streaming twin (StreamOps.countMinSketch): d=4 pairwise hash rows
  * h_j(u) = ((a_j*u + b_j) mod p) mod w over a Mersenne-31 prime, with the
  * classic public LCG multipliers as row constants. `a*u` stays inside
  * int64 because u is reduced mod p first (a < 2^31, u mod p < 2^31).
  *
  * The sketch itself is just `groupBy(j, bucket).count()` over the rows
  * this helper explodes — a fixed d x w cell table whose counts merge
  * across partitions, shards, and streaming triggers like any long sum.
  * Point estimates read min_j cell(j, h_j(u)), never underestimating.
  */
object CountMin {
  val P: Long = 2147483647L
  val Width: Int = 32
  val Rows: Int = 4
  private val A = Seq(1103515245L, 214013L, 134775813L, 22695477L)
  private val B = Seq(12345L, 2531011L, 1L, 1L)

  /** array<struct<j,a,b>> literal — explode to one row per hash row. */
  def params: Column = array(A.indices.map(j =>
    struct(lit(j).as("j"), lit(A(j)).as("a"), lit(B(j)).as("b"))): _*)

  /** Bucket of `key` under hash row constants (a, b) — total over
    * arbitrary long keys: the first reduction is `pmod` (Spark's `%`
    * follows the dividend's sign, so a negative key — e.g. a signed
    * 64-bit hash — would otherwise land in a NEGATIVE bucket, silently
    * widening the cell space and weakening the width guarantee); every
    * later term is then non-negative, so plain `%` stays in [0, Width).
    *
    * Compatibility: this formula changed for NEGATIVE keys (they used to
    * land in negative buckets). A streaming sketch resumed from a
    * checkpoint written by the old formula, with negative keys in a
    * still-open window, would split those keys' counts across the old and
    * new cells and transiently under-estimate them — drain open windows
    * (or restart from a fresh checkpoint) when upgrading across this
    * change if negative keys occur.
    */
  def bucket(key: Column, a: Column, b: Column): Column =
    ((a * pmod(key, lit(P)) + b) % P) % Width

  /** Build the sketch over `keyCol`: one row per non-empty (j, bucket)
    * cell with its long count. Map-side partial aggregation; cells merge
    * across shards (and, windowed, across streaming triggers) like any
    * long sum.
    */
  def build(df: org.apache.spark.sql.DataFrame, keyCol: String)
      : org.apache.spark.sql.DataFrame =
    df.select(col(keyCol).as("__cm_key"), explode(params).as("h"))
      .groupBy(col("h.j").as("j"),
        bucket(col("__cm_key"), col("h.a"), col("h.b")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each row of `keys` against a built sketch:
    * est = min over the d rows of the key's hashed cells (deterministic
    * never-underestimate). The sketch is at most Rows x Width rows, so it
    * BROADCASTs. An absent cell is a ZERO counter — `build` only emits
    * non-empty cells — so the join is LEFT with the missing count read as
    * 0: a key with ANY empty cell estimates 0 (provably unseen), exactly
    * the count-min read (an inner join here would silently drop the zero
    * from the min and report colliding heavy-key counts for a key the
    * sketch can prove absent).
    */
  def estimate(sketch: org.apache.spark.sql.DataFrame,
      keys: org.apache.spark.sql.DataFrame, keyCol: String)
      : org.apache.spark.sql.DataFrame =
    keys.select(col(keyCol), explode(params).as("h"))
      .select(col(keyCol), col("h.j").as("j"),
        bucket(col(keyCol), col("h.a"), col("h.b")).as("bucket"))
      .join(org.apache.spark.sql.functions.broadcast(sketch),
        Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
}
