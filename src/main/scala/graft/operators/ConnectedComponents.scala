package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star contraction
  * (the MapReduce CC algorithm of Kiveris et al., re-expressed as DataFrame
  * rounds). Converges in O(log n) rounds regardless of graph diameter — the
  * scale-correct choice when dedup graphs contain long chains, where plain
  * min-label propagation needs O(diameter) shuffles (d15's LSH cliques have
  * diameter ~1, so the simple loop is right there; this operator is the
  * general-graph path).
  *
  * Each round is two grouped aggregations + joins on node id; lineage is
  * truncated per round (localCheckpoint — reliable checkpoint on a cluster).
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (u, v) of undirected edges
    * @param checkpoint lineage-truncation seam (the clusters() contract):
    *        within-query callers keep the default (blocks drained by
    *        Caches.release); memoizing callers pass a plain
    *        `_.localCheckpoint()` so release can never drop blocks their
    *        memoized frame still depends on
    * @return ((node, component) assignment — component = min node id
    *         reachable, nodes include every endpoint), rounds executed
    */
  def alternatingStar(edges: DataFrame,
      checkpoint: DataFrame => DataFrame = graft.sources.Caches.checkpointed)
      : (DataFrame, Int) = {
    val u = col("u"); val v = col("v")
    // canonical directed pair list, self-loops dropped
    var e = edges.select(u.cast("long").as("u"), v.cast("long").as("v"))
      .filter(u =!= v)
      .select(least(u, v).as("u"), greatest(u, v).as("v"))
      .distinct()
      .transform(checkpoint)

    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(u, v).cast("long")), sum(u + v)).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    // large-star: every neighbor larger than u links to u's min; small-star:
    // every smaller neighbor (and u) links to u's overall min
    // symmetric adjacency via a single-branch explode — self-union of a
    // DataFrame with its own swapped projection shares attribute ids across
    // union children and breaks constraint rewriting
    def symmetric(df: DataFrame): DataFrame =
      df.select(explode(array(
          struct(u.as("u"), v.as("v")),
          struct(v.as("u"), u.as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))

    def largeStar(df: DataFrame): DataFrame = {
      val adj = symmetric(df)
      // aggregate under fresh names: m derives from adj, and a direct
      // self-join would leave ambiguous attribute ids
      val m = adj.groupBy(u).agg(least(min(v), first(u)).as("m"))
        .select(u.as("mu"), col("m"))
      adj.join(m, u === col("mu")).filter(v > u)
        .select(least(v, col("m")).as("u"), greatest(v, col("m")).as("v"))
        .filter(u =!= v).distinct()
    }
    def smallStar(df: DataFrame): DataFrame = {
      val smaller = symmetric(df).filter(v < u)
      val m = smaller.groupBy(u).agg(min(v).as("m"))
        .select(u.as("mu"), col("m"))
      smaller.join(m, u === col("mu"))
        .select(explode(array(
          struct(least(v, col("m")).as("u"), greatest(v, col("m")).as("v")),
          struct(col("m").as("u"), u.as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(u =!= v).distinct()
    }

    var rounds = 0
    var converged = e.isEmpty
    while (!converged && rounds < 64) {
      val next = checkpoint(smallStar(largeStar(e)))
      converged = signature(next) == signature(e)
      e = next
      rounds += 1
    }
    // fixpoint is a star forest: u is the component root of each v (and of
    // itself) — emitted in one explode to avoid the self-union pattern
    val assignment = e.select(explode(array(
        struct(v.as("node"), u.as("component")),
        struct(u.as("node"), u.as("component")))).as("a"))
      .select(col("a.node").as("node"), col("a.component").as("component"))
      .distinct()
    (assignment, rounds)
  }
}
