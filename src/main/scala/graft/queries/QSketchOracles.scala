package graft.queries

/** SQL CTE emitters for the q53/q54 QSketch oracles, built from the same
  * driver-side constants as the Spark plan (`functions/QSketch.SubBits`)
  * so the bucket arithmetic cannot drift between engines — the
  * `Hll.estimateCtesSql` discipline.
  */
private[queries] object QSketchOracles {

  private val K = graft.functions.QSketch.SubBits

  /** lineitem prices in exact cents (IEEE floor(x*100 + 0.5) — the same
    * double ops on both engines).
    */
  val centsCte: String =
    """vals AS (SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
      |    AS cents FROM lineitem)""".stripMargin

  /** vals(cents) -> state(bucket_lo, cnt): bit length via the proven
    * bin()/length parity, top K+1 bits kept by shift round-trip.
    */
  val stateCtes: String =
    s"""b AS (SELECT cents AS v,
       |    greatest(length(bin(cents)) - ${1 + K}, 0) AS s FROM vals),
       |state AS (SELECT (v >> s) << s AS bucket_lo,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1)""".stripMargin

  /** One named state CTE over any relation exposing a `cents` column —
    * the q55 merge oracle builds three of these (two shards + the whole)
    * from the same constants.
    */
  def stateCteOver(valsRel: String, stateName: String): String =
    s"""$stateName AS (SELECT (v >> s) << s AS bucket_lo,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT cents AS v,
       |      greatest(length(bin(cents)) - ${1 + K}, 0) AS s FROM $valsRel)
       |  GROUP BY 1)""".stripMargin

  /** The SIGNED variant's CTEs over a relation exposing a `cents` column:
    * bucket keys mirror through the magnitude (key = sign * posLo(|v|);
    * zero falls out of the same formula since bin(0) has length 1), so
    * keys sort in value order and the read walk needs no sign cases.
    */
  val signedStateCtes: String =
    s"""b AS (SELECT cents, abs(cents) AS a,
       |    greatest(length(bin(abs(cents))) - ${1 + K}, 0) AS s FROM vals),
       |state AS (SELECT CASE WHEN cents >= 0 THEN (a >> s) << s
       |                      ELSE -((a >> s) << s) END AS bucket_key,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1)""".stripMargin

  /** signed state -> reads(q, lo, hi, target): same cumulative walk, with
    * the bucket edges recovered sign-aware from the key's magnitude.
    */
  def signedReadCtes(qs: Seq[Double]): String = {
    val width = s"(CAST(1 AS BIGINT) << greatest(length(bin(abs(key))) - ${1 + K}, 0))"
    s"""tot AS (SELECT sum(cnt) AS n FROM state),
       |cumt AS (SELECT bucket_key, sum(cnt) OVER (ORDER BY bucket_key) AS cum
       |  FROM state),
       |qs AS (SELECT CAST(unnest([${qs.mkString(", ")}]) AS DOUBLE) AS q),
       |tgt AS (SELECT q, greatest(CAST(1 AS BIGINT),
       |    CAST(ceil(q * n) AS BIGINT)) AS target FROM qs CROSS JOIN tot),
       |ch AS (SELECT t.q, t.target, min(c.bucket_key) AS key
       |  FROM tgt t JOIN cumt c ON c.cum >= t.target GROUP BY 1, 2),
       |reads AS (SELECT q,
       |    CASE WHEN key > 0 THEN key WHEN key = 0 THEN CAST(0 AS BIGINT)
       |         ELSE -((-key) + $width - 1) END AS lo,
       |    CASE WHEN key > 0 THEN key + $width - 1
       |         WHEN key = 0 THEN CAST(0 AS BIGINT) ELSE key END AS hi,
       |    target FROM ch)""".stripMargin
  }

  /** state -> reads(q, lo, hi, target): cumulative walk over the bounded
    * bucket table, first bucket reaching the target rank, upper edge
    * recovered from lo's own bit length.
    */
  def readCtes(qs: Seq[Double]): String =
    s"""tot AS (SELECT sum(cnt) AS n FROM state),
       |cumt AS (SELECT bucket_lo, sum(cnt) OVER (ORDER BY bucket_lo) AS cum
       |  FROM state),
       |qs AS (SELECT CAST(unnest([${qs.mkString(", ")}]) AS DOUBLE) AS q),
       |tgt AS (SELECT q, greatest(CAST(1 AS BIGINT),
       |    CAST(ceil(q * n) AS BIGINT)) AS target FROM qs CROSS JOIN tot),
       |ch AS (SELECT t.q, t.target, min(c.bucket_lo) AS lo
       |  FROM tgt t JOIN cumt c ON c.cum >= t.target GROUP BY 1, 2),
       |reads AS (SELECT q, lo,
       |    lo + (CAST(1 AS BIGINT) << greatest(length(bin(lo)) - ${1 + K}, 0))
       |      - 1 AS hi,
       |    target FROM ch)""".stripMargin
}
