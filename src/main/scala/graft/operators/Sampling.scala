package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public deterministic sampling / splitting / mixing API — the d13/d29/
  * d30/d33 shapes for any DataFrame. Everything is a content-independent
  * md5-of-id hash decision: no RNG state, no coordination, reproducible
  * across engines, re-runs, shards and corpus appends; the filters are
  * stateless narrow maps (pushdown-friendly). Distinct decisions use
  * DISJOINT md5 substring windows so they are independent of each other
  * (sample: chars 1-8, split: 9-13, mix: 14-18 as a 20-bit fraction).
  */
object Sampling {

  /** Deterministic 1-in-`mod` sample: keep rows whose id-hash bucket
    * equals `bucket` (d13's shape).
    */
  def hashSample(df: DataFrame, idCol: String, mod: Int, bucket: Int = 0): DataFrame =
    df.filter(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % mod === bucket)

  /** Adds a `split` column: "val" for ~1/`valDenominator` of rows, else
    * "train" (d33's shape) — stable under re-runs and appends of new ids.
    */
  def withTrainValSplit(df: DataFrame, idCol: String,
      valDenominator: Int = 20): DataFrame =
    df.withColumn("split",
      when(conv(substring(md5(col(idCol).cast("string")), 9, 5), 16, 10)
        .cast("long") % valDenominator === 0, "val").otherwise("train"))

  /** Down-sample every stratum to the smallest stratum's share (d30's
    * corpus-mixing shape): keep iff hash20(id) * c(stratum) < min_c * 2^20
    * — pure integer arithmetic against a broadcast per-stratum rate table.
    */
  def mixToSmallest(df: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
    val m = counts.agg(min(col("__c")).as("__m"))
    df.withColumn("__hm",
        conv(substring(md5(col(idCol).cast("string")), 14, 5), 16, 10)
          .cast("long") % 1048576L)
      .join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(m))
      .filter(col("__hm") * col("__c") < col("__m") * 1048576L)
      .drop("__hm", "__c", "__m")
  }

  /** The k rows with the smallest `orderCol` value per stratum via the
    * bounded TopKStruct aggregate (d29's min-wise shape): O(k) state per
    * stratum with map-side partials — no per-group sort, no window over
    * the corpus. Returns strata + `rank` + the id and order columns.
    */
  def minwisePerStratum(df: DataFrame, strataCols: Seq[String],
      orderCol: String, idCol: String, k: Int): DataFrame =
    df.groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKStruct.topk_struct(k,
        struct(col(orderCol), col(idCol))).as("__tk"))
      .select(strataCols.map(col) :+ posexplode(col("__tk")).as(Seq("__pos", "__t")): _*)
      .select(strataCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("long").as("rank"),
        col(s"__t.$idCol").as(idCol),
        col(s"__t.$orderCol").as(orderCol)): _*)

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "A-ES"): each row draws u in (0, 1] from md5 chars
    * 19-26 of its id (a fourth DISJOINT hash window, so the draw is
    * independent of the sample/split/mix decisions above) and keeps key
    * ln(u)/w — the k LARGEST keys are a weighted sample where a row's
    * inclusion odds are proportional to its weight. Content-independent,
    * coordination-free, reproducible across engines and shards like every
    * decision in this file; ln() appears once per row behind a 1e-9
    * floor-quantization (the d52/d57 ulp discipline), so the ordering the
    * top-k sees is engine-exact.
    *
    * Scale shape: one narrow map then a bounded top-k
    * (TakeOrderedAndProject — k rows per partition move, never a global
    * sort); the rank window runs over the k collected rows only.
    *
    * Returns `(rank, idCol, weight, key_q9)`, best first.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    // (h + 1) / (2^32 + 1) in (0, 1]: u = 1 -> key 0 (best possible)
    val u = (conv(substring(md5(col(idCol).cast("string")), 19, 8), 16, 10)
      .cast("long") + 1L).cast("double") / 4294967297.0d
    val keyed = df
      .filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        floor(log(u) / col(weightCol).cast("double") * 1000000000.0d)
          .cast("long").as("key_q9"))
      .orderBy(col("key_q9").desc, col(idCol)).limit(k)
    keyed.select(
      row_number().over(Window.orderBy(col("key_q9").desc, col(idCol)))
        .cast("long").as("rank"),
      col(idCol), col("weight"), col("key_q9"))
  }
}
