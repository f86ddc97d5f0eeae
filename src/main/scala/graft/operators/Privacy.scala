package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy release gates for corpus metadata: k-anonymity auditing,
  * global-recoding generalization, and l-diversity — the checks a corpus
  * with user-linked metadata needs before that metadata can ship alongside
  * the text. Public and table-agnostic (the TextDedup/VectorSearch/
  * MediaDedup pattern): point them at any DataFrame; the d180-d182 queries
  * are thin bindings of these calls to the testdata tables, so the DuckDB
  * oracle gate verifies the APIs themselves.
  *
  * Scale posture: every call is one-or-few hash aggregations over the
  * quasi-identifier (QI) columns. Class tables are |distinct QI
  * combinations| rows — orders below the corpus — and join back by
  * BROADCAST, so the corpus side is never re-shuffled (the alternative,
  * count-over-partition windows, would pay one corpus shuffle per
  * generalization level). At 100 TB the levers are the QI arity and band
  * widths, which bound the class-table size, not the corpus size.
  */
object Privacy {

  /** Equivalence-class audit: one row per distinct combination of `qi`
    * with its `class_size` and `at_risk` = size < k (the classes whose
    * members a linker could re-identify). One hash aggregation.
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], k: Int): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)

  /** Global-recoding generalization ladder: each row settles at the
    * SMALLEST level (index into `levels`) whose equivalence class over
    * that level's columns reaches `k`; the LAST level is the
    * unconditional fallback (its class size is never consulted — make it
    * coarse enough to always satisfy k). Returns the input plus
    * `settle_level` (int) and `class_key` (the settled level's key values
    * joined with '|'). Per consulted level: one tiny aggregation builds
    * the class-size table, broadcast-joined back — zero corpus
    * re-shuffles.
    *
    * Columns named `sz0..szN` are claimed internally.
    */
  def generalizeLadder(df: DataFrame, levels: Seq[Seq[String]], k: Int): DataFrame =
    generalizeLadderWith(df, levels, k, df)

  /** [[generalizeLadder]] with class sizes computed from `reference`
    * instead of `df` itself — the cross-dump/production shape: today's
    * rows settle against the published cohort's statistics (so the same
    * row always lands in the same class regardless of which dump carries
    * it), and because every step is a stateless broadcast join the SAME
    * call generalizes a live STREAM against a static reference
    * (StreamOps.generalizeRoute; a class absent from the reference counts
    * as size 0 — maximally identifying — and falls through the ladder).
    */
  def generalizeLadderWith(df: DataFrame, levels: Seq[Seq[String]], k: Int,
      reference: DataFrame): DataFrame = {
    require(levels.size >= 2, "need at least one consulted level plus the fallback")
    val consulted = levels.dropRight(1)
    val sized = consulted.zipWithIndex.foldLeft(df) { case (acc, (ks, lvl)) =>
      val sizes = reference.groupBy(ks.map(col): _*).agg(count(lit(1)).as(s"sz$lvl"))
      acc.join(broadcast(sizes), ks, "left")
    }
    val settle = consulted.indices.foldRight(lit(levels.size - 1): Column) {
      case (lvl, rest) => when(col(s"sz$lvl") >= k, lvl).otherwise(rest)
    }
    val keyed = sized.withColumn("settle_level", settle)
    val classKey = levels.zipWithIndex.foldRight(lit(null).cast("string"): Column) {
      case ((ks, lvl), rest) =>
        when(col("settle_level") === lvl, concat_ws("|", ks.map(col): _*))
          .otherwise(rest)
    }
    keyed.withColumn("class_key", classKey)
      .drop(consulted.indices.map(l => s"sz$l"): _*)
  }

  /** l-diversity: per `qi` class, the number of DISTINCT `sensitive`
    * values and `diverse_ok` = that count >= l. A class can be k-anonymous
    * yet leak the sensitive attribute when every member shares one value.
    * One hash aggregation.
    */
  def lDiversity(df: DataFrame, qi: Seq[Column], sensitive: Column, l: Int): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("diverse_ok", col("l_distinct") >= l)
}
