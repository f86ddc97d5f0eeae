package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * The driver's parquet has stored timestamps two ways across rounds:
  * INT64 TIMESTAMP(NANOS) (Spark 4 reads it only via
  * `spark.sql.legacy.parquet.nanosAsLong`, as raw nanos) and plain
  * `timestamp[us]` with isAdjustedToUTC=false (Spark reads TIMESTAMP_NTZ).
  * This loader normalizes both to TimestampType (µs, session tz pinned to
  * UTC, integer arithmetic — ns values exceed double precision) so engine
  * code and the DuckDB oracle see identical µs-precision timestamps.
  */
object Tables {

  /** Timestamp-bearing columns per table (either encoding). */
  private val nanoTsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate")
  )

  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    nanoTsColumns.getOrElse(table, Nil).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        // integer div: epoch-ns (~1.7e18) exceeds double's 53-bit mantissa
        case LongType => d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        // NTZ wall-clock reinterpreted in the session tz (pinned UTC above)
        // — identical instants, and downstream unix_millis etc. resolve
        case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }
  }
}
