package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic events -> prometheus-samples mapping shared by every
  * pipeline-parity query and its DuckDB oracle.
  *
  * Convention (documented once, mirrored in [[SqlFragments.samplesCte]]):
  *   - labels: __name__ = event_type, __replica__ = "r"+(event_id%2),
  *     k = props."k" (regex-extracted), user = user_id
  *   - tenant: event_id%3 -> "", "team-a", "team-b"
  *   - ts_ms: epoch millis of ts (µs truncated)
  */
object EventSamples {

  def df(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events").select(
      col("event_id"),
      col("user_id"),
      col("event_type").as("name"),
      unix_millis(col("ts")).as("ts_ms"),
      col("value"),
      map(
        lit("__name__"), col("event_type"),
        lit("__replica__"), concat(lit("r"), pmod(col("event_id"), lit(2)).cast("string")),
        lit("k"), regexp_extract(col("props"), "\"k\": (\\d+)", 1),
        lit("user"), col("user_id").cast("string")
      ).as("labels"),
      when(pmod(col("event_id"), lit(3)) === 0, "")
        .when(pmod(col("event_id"), lit(3)) === 1, "team-a")
        .otherwise("team-b").as("tenantId")
    )
}

/** DuckDB SQL fragments mirroring the Spark-side conventions byte-for-byte. */
object SqlFragments {

  /** The events->samples mapping as a CTE (keep in sync with EventSamples). */
  val samplesCte: String =
    """WITH samples AS (
      |  SELECT event_id, user_id, event_type AS name,
      |         epoch_ms(ts) AS ts_ms, value,
      |         'r' || CAST(event_id % 2 AS VARCHAR) AS replica,
      |         regexp_extract(props, '"k": (\d+)', 1) AS k,
      |         CAST(user_id AS VARCHAR) AS usr,
      |         CASE CAST(event_id % 3 AS INT) WHEN 0 THEN '' WHEN 1 THEN 'team-a' ELSE 'team-b' END AS tenant
      |  FROM events)""".stripMargin

  /** Go shortest-float formatting of a double expr (strips DuckDB's ".0"). */
  def goFloat(expr: String): String =
    s"regexp_replace(CAST($expr AS VARCHAR), '\\.0$$', '')"

  /** model.Time seconds string: ms -> fractional seconds, shortest. */
  val secStr: String = goFloat("ts_ms / 1000.0")

  /** Sample value as Go string. */
  val valStr: String = goFloat("value")

  /** RFC3339Nano UTC of ts_ms with trimmed fractional zeros. */
  val rfcStr: String =
    "strftime(make_timestamp(ts_ms * 1000), '%Y-%m-%dT%H:%M:%S') || " +
      "CASE WHEN ts_ms % 1000 = 0 THEN '' ELSE '.' || rtrim(lpad(CAST(ts_ms % 1000 AS VARCHAR), 3, '0'), '0') END || 'Z'"

  /** Sorted-label JSON object (sort order: __name__ < __replica__ < k < user). */
  val labelObj: String =
    """'{"__name__":"' || name || '","__replica__":"' || replica || '","k":"' || k || '","user":"' || usr || '"}'"""

  /** Default `json` wire payload. */
  val jsonPayload: String =
    s"""'{"value":[' || $secStr || ',"' || $valStr || '"],"metric":' || $labelObj || """ +
      """CASE WHEN tenant = '' THEN '' ELSE ',"tenant_id":"' || tenant || '"' END || '}'"""

  /** `json-compat` wire payload (Go map key order: labels,name,tenant_id,timestamp,value). */
  val compatPayload: String =
    s"""'{"labels":' || $labelObj || ',"name":"' || name || '"' || """ +
      """CASE WHEN tenant = '' THEN '' ELSE ',"tenant_id":"' || tenant || '"' END || """ +
      s"""',"timestamp":"' || $rfcStr || '","value":"' || $valStr || '"}'"""

  /** `avro-json-compat` payload (schema field order, tenant_id always present). */
  val avroPayload: String =
    s"""'{"timestamp":"' || $rfcStr || '","value":"' || $valStr || '","name":"' || name || """ +
      s"""'","labels":' || $labelObj || ',"tenant_id":"' || tenant || '"}'"""

  /** FNV-1 64 accumulator over a string expr (ASCII input), as HUGEINT. */
  def fnvAcc(strExpr: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |  [unicode(c)::HUGEINT FOR c IN string_split($strExpr, '')]),
       |  (acc, b) -> xor((acc * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT, b))""".stripMargin

  /** Render an unsigned-64 HUGEINT column as Go's `"hex %016x"`. */
  def hexKey(col: String): String =
    s"""printf('hex %016x', CAST(CASE WHEN $col >= 9223372036854775808::HUGEINT
       |  THEN $col - 18446744073709551616::HUGEINT ELSE $col END AS BIGINT))""".stripMargin
}
