package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Readers for the driver-generated parquet tables (TESTDATA.md). Plain
 * `spark.read.parquet` everywhere — filters/projections stay with
 * Catalyst so pushdown reaches the scan — with one wrinkle: the `events`
 * table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's reader
 * rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw int64
 * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
 * microsecond-precision TimestampType column; the driver data is
 * microsecond-grained so the conversion is lossless.
 */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
