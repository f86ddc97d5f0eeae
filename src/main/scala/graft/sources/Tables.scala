package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
  * Spark 4 only reads via `spark.sql.legacy.parquet.nanosAsLong` (as raw
  * nanos). This loader normalizes those columns back to TimestampType (µs,
  * integer arithmetic — ns values exceed double precision) so engine code and
  * the DuckDB oracle see identical µs-precision timestamps.
  */
object Tables {

  /** Columns stored as TIMESTAMP(NANOS) per table. */
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
      if (d.schema(c).dataType == LongType)
        // integer div: epoch-ns (~1.7e18) exceeds double's 53-bit mantissa
        d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else d
    }
  }
}
