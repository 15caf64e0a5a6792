package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/**
 * Readers for the driver-generated parquet tables (TESTDATA.md). Plain
 * `spark.read.parquet` everywhere — filters/projections stay with
 * Catalyst so pushdown reaches the scan — with one wrinkle: the `events`
 * table has shipped `ts` two ways across testdata generations: parquet
 * TIMESTAMP(NANOS) (which Spark's reader rejects outright,
 * [PARQUET_TYPE_ILLEGAL], so we read nanos as raw int64 via
 * `spark.sql.legacy.parquet.nanosAsLong` and convert), and plain
 * micros TIMESTAMP (read as TIMESTAMP_NTZ). `normalizeTs` maps either
 * to a microsecond TimestampType column; sessions run UTC, so the
 * NTZ→instant cast is value-identical.
 */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Coerce an events frame's `ts` to micros TimestampType regardless
    * of which physical layout the parquet used. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // int64 epoch nanos (nanosAsLong read)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampType => df
    case _ => // TIMESTAMP_NTZ et al: wall clock == instant under UTC
      df.withColumn("ts", col("ts").cast(TimestampType))
  }
}
