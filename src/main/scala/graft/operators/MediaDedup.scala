package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Media near-duplicate detection over perceptual frame hashes — the public,
  * table-agnostic API the m05/m11/m12 query shapes bind to (the
  * TextDedup/VectorSearch pattern: operators take the caller's DataFrames
  * and column names; the oracle-checked queries become thin bindings).
  *
  * Inputs are frame-hash tables: one row per (item, 64-bit perceptual
  * hash) — produced by [[Multimodal.videoFrameDHash]] for real containers
  * or any other hasher with the same shape. All candidate generation is
  * bucket-joined and df-valved (the d81/d03 discipline): at 100 TB the
  * join is priced on valved hash buckets — never media x media — and
  * Hamming verification is one codegen xor+popcount per candidate pair,
  * never a second decode.
  */
object MediaDedup {

  /** Distinct poison-filtered (id, hash) rows from a real container decode:
    * [[Multimodal.videoFrameDHash]] emits frame_idx -1 / hash 0 for
    * undecodable payloads (the p06 convention); those rows must surface in
    * decode audits, never blend into a candidate join as a shared fake
    * hash — so this entry point drops them before anything downstream.
    */
  def frameHashes(media: Dataset[Multimodal.MediaItem], step: Int = 1): DataFrame =
    Multimodal.videoFrameDHash(media, step).toDF()
      .filter(col("frame_idx") >= 0)
      .select(col("doc_id"), col("dhash")).distinct()

  /** Near-dup pairs by SHARED EXACT hash keys (the m05/m11 shape): valve
    * each hash on its item-df (`dfMin..dfMax` — ubiquitous gradients /
    * intro frames never explode the join), pair items sharing at least
    * `minShared` hashes, and score containment against the smaller item's
    * distinct-hash count (the d63 convention). Returns
    * `(a, b, shared, overlap_q6)` with a < b, unordered.
    *
    * `hashes` should be distinct (id, hash) rows; when several consumers
    * reuse the same decoded table, cache it once (Caches.ephemeral) and
    * pass the cached frame — this operator never materializes it itself.
    */
  def sharedHashPairs(hashes: DataFrame, idCol: String, hashCol: String,
      dfMin: Int = 2, dfMax: Int = 64, minShared: Int = 2): DataFrame = {
    // the caller's column names are kept through the plan (the hash
    // equijoin reads `<hashCol>` in explain output — PlanSpec pins it)
    val fr = hashes.select(col(idCol), col(hashCol))
    val nf = fr.groupBy(col(idCol)).agg(count(lit(1)).as("nf"))
    val valve = fr.groupBy(col(hashCol))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df").between(dfMin, dfMax))
      .select(col(hashCol))
    val fo = fr.join(valve, Seq(hashCol))
    val pairs = fo.select(col(idCol).as("a"), col(hashCol))
      .join(fo.select(col(idCol).as("b"), col(hashCol)), Seq(hashCol))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(nf.select(col(idCol).as("a"), col("nf").as("na")), Seq("a"))
      .join(nf.select(col(idCol).as("b"), col("nf").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("shared"),
        floor(col("shared") * lit(1000000L) / least(col("na"), col("nb")))
          .cast("long").as("overlap_q6"))
  }

  /** The `bands` 16-bit band values of a 64-bit hash column (band `bd`
    * reads bits [16 bd, 16 bd + 16) via shiftrightunsigned, so the sign
    * bit lands in the top band — candidates and index queries must agree).
    */
  private def bandCols(hash: Column, bands: Int): Seq[(Int, Column)] =
    (0 until bands).map(bd => bd ->
      shiftrightunsigned(hash, 16 * bd).bitwiseAND(lit(0xFFFFL)))

  /** Near-dup pairs by BANDED HAMMING search (the m12 shape — the d35/d48
    * SimHash discipline on the media path): exact-equal joins only find
    * identical frames, but re-encodes and small overlays differ by a FEW
    * bits, so candidates come from splitting each hash into `bands` x
    * 16-bit bands (Hamming <= bands-1 guarantees one exact band by
    * pigeonhole; larger `maxHamming` is recall-best-effort, the production
    * trade), df-valving each band bucket, pairing within buckets, and
    * verifying EXACT Hamming with one xor+popcount per candidate. Returns
    * `(a, b, min_ham, n_close)` with a < b, unordered.
    */
  def bandedHammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      bands: Int = 4, dfMin: Int = 2, dfMax: Int = 64,
      maxHamming: Int = 8): DataFrame = {
    require(bands >= 1 && bands <= 4, s"bands must be in 1..4, got $bands")
    val fr = hashes.select(col(idCol), col(hashCol))
    val bandRows = fr.select(col(idCol), col(hashCol),
      explode(array(bandCols(col(hashCol), bands).map { case (bd, c) =>
        struct(lit(bd.toLong).as("bnd"), c.as("bv")) }: _*)).as("e"))
      .select(col(idCol), col(hashCol), col("e.bnd"), col("e.bv"))
    val valve = bandRows.groupBy(col("bnd"), col("bv"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df").between(dfMin, dfMax))
      .select(col("bnd"), col("bv"))
    val bo = bandRows.join(valve, Seq("bnd", "bv"))
    val cand = bo.select(col(idCol).as("a"), col(hashCol).as("ha"),
        col("bnd"), col("bv"))
      .join(bo.select(col(idCol).as("b"), col(hashCol).as("hb"),
        col("bnd"), col("bv")), Seq("bnd", "bv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
    cand
      .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("ham") <= maxHamming)
      .groupBy(col("a"), col("b"))
      .agg(min(col("ham")).cast("long").as("min_ham"),
        count(lit(1)).as("n_close"))
  }

  /** Persistable media near-dup index: the DISTINCT perceptual hashes of a
    * reference corpus, one `dhash` column. Build ONCE per reference, write
    * to parquet, and feed [[dedupAgainstIndex]] for every subsequent dump
    * (batch or stream): the reference media is decoded once EVER, and the
    * index is |distinct hashes| rows regardless of corpus size. Band
    * values are DERIVED from the stored hash at query time, so the index
    * carries no (bands, maxHamming) settings — query-time parameters are
    * free to vary without a rebuild (unlike TextDedup.buildIndex, whose
    * shingle settings bake into the keys).
    */
  def buildIndex(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.select(col(hashCol).as("dhash")).distinct()

  /** Incremental index maintenance (TextDedup.appendToIndex's media twin —
    * the day-over-day ingestion loop): fold a new batch's hashes
    * (typically the SURVIVORS of [[dedupAgainstIndex]]) into the index so
    * tomorrow's dump dedupes against reference + everything admitted so
    * far. Deduplicated, so the index stays |distinct hashes| at any
    * history length; unlike the text index, no build-time settings bake
    * into the rows, so bands/maxHamming stay query-time choices.
    */
  def appendToIndex(index: DataFrame, newHashes: DataFrame,
      hashCol: String): DataFrame =
    index.unionAll(buildIndex(newHashes, hashCol)).distinct()

  /** Drop frame-hash rows that are within `maxHamming` bits of any index
    * hash SHARING a 16-bit band (candidates require band equality — exact
    * for maxHamming <= bands-1 by pigeonhole, recall-best-effort above).
    * Works identically on batch and STREAMING `frames` (the plan is a
    * chain of stateless stream-static left_anti equi-joins, one per band,
    * each with the popcount verify as a residual predicate — a row
    * survives iff every band chain misses, i.e. no index hash is both
    * band-equal and Hamming-close). Decisions are batch-identical; no
    * state, no watermark, no reference media in sight.
    */
  def dedupAgainstIndex(frames: DataFrame, index: DataFrame, hashCol: String,
      bands: Int = 4, maxHamming: Int = 8): DataFrame = {
    require(bands >= 1 && bands <= 4, s"bands must be in 1..4, got $bands")
    bandCols(col(hashCol), bands).foldLeft(frames) { case (acc, (bd, bc)) =>
      val idx = index.select(col("dhash").as("__ih"),
        bandCols(col("dhash"), bands)(bd)._2.as("__ibv"))
      acc.withColumn("__bv", bc)
        .join(idx, col("__bv") === col("__ibv") &&
          bit_count(col(hashCol).bitwiseXOR(col("__ih"))) <= maxHamming,
          "left_anti")
        .drop("__bv")
    }
  }
}
