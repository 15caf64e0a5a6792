package graft.streaming

import graft.operators.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Running distinct-count maintenance — the streaming deployment of the
 * [[Stats.hllRegisters]] merge law (the same partial-stats
 * re-aggregation the reference's StatisTask relies on): a value stream
 * lands in micro-batches; each batch's registers max-merge into the
 * stored register snapshot. The estimate is answerable at any time
 * from the at-rest frame without touching history.
 *
 * State sizing at 100 TB (the deployability number): the at-rest state
 * is ≤ 2^b rows of two longs FOREVER — it does not grow with the
 * stream. No watermark, no state store: the merge is associative,
 * commutative and idempotent (max), so replaying a failed batch onto
 * its own output is harmless, and the versioned-snapshot protocol
 * (same as [[ChangeLogListener]]: merge base = latest committed
 * version STRICTLY below the batch id, `_SUCCESS` gates visibility)
 * makes recovery exact rather than merely harmless.
 */
final class StreamingDistinct(indexPath: String, valueCol: String,
    b: Int) extends Serializable {
  require(b >= 4 && b <= 16, "register-index width b must be in [4,16]")

  private def versions(spark: SparkSession): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(root, s"v$v/_SUCCESS")))
      .sorted
  }

  /** Latest committed register snapshot (None before the first batch). */
  def currentRegisters(spark: SparkSession): Option[DataFrame] =
    versions(spark).lastOption.map(v =>
      spark.read.parquet(s"$indexPath/v$v"))

  /** Cardinality estimate from the current snapshot (0 pre-stream). */
  def estimate(spark: SparkSession): Double =
    currentRegisters(spark).map(Stats.hllEstimate(_, b)).getOrElse(0.0)

  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val br = Stats.hllRegisters(batch, valueCol, b)
    val existing = versions(spark).filter(_ < batchId).lastOption
      .map(v => spark.read.parquet(s"$indexPath/v$v"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("reg", LongType),
          StructField("max_rho", LongType)))))
    existing.unionByName(br)
      .groupBy(col("reg")).agg(max(col("max_rho")).as("max_rho"))
      .coalesce(1) // ≤ 2^b rows — one file, one commit
      .write.mode("overwrite").parquet(s"$indexPath/v$batchId")
  }

  /** Start tailing: one register merge per committed micro-batch. */
  def run(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id)
        ()
      }
      .start()
}
