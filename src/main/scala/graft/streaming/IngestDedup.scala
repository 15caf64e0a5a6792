package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Incremental-ingest dedup — the production re-crawl loop the batch
 * [[graft.pipeline.Dedup.bloomDedupNew]] operator exists for: a
 * document stream lands in micro-batches; each batch dedups against
 * the STORED fingerprint index (bloom prefilter + exact verify join on
 * the maybe-sliver) and appends only its genuinely-new fingerprints
 * back to the index. `foreachBatch` is the right Structured Streaming
 * primitive: the batch-vs-store comparison is a batch join per trigger
 * (the store is data at rest, not a stream), and the store append is
 * one atomic parquet commit per micro-batch, replay-safe under the
 * checkpoint's batch-id dedup contract.
 *
 * State sizing at 100 TB (the number that decides deployability): the
 * only driver-resident state is the bloom — `numBits/8` bytes
 * REGARDLESS of corpus size (10^10 stored fingerprints at 1% fpp ≈
 * 1.2 GB; `expectedItems`/`numBits` are the dial). The exact index
 * stays at rest as parquet; per batch, only the maybe-sliver
 * (dup rate + fpp of the batch) shuffles against it. Nothing in the
 * streaming state store grows with the corpus — watermark-free by
 * construction, because the dedup horizon is the at-rest index, not
 * buffered stream state.
 *
 * Within-batch duplicates collapse by the same min-id election law as
 * `Dedup.exact` (an aggregate, never a window over a possibly-hot
 * fingerprint) BEFORE the append, so the index stays duplicate-free.
 */
object IngestDedup {

  /** The stored index: (id, fp) parquet, empty frame if absent yet. */
  def readIndex(spark: SparkSession, storeDir: String,
      idCol: String): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName
        .endsWith(".parquet")))
      spark.read.parquet(storeDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType))))
  }

  /**
   * One micro-batch step (also the batch-replay oracle the spec uses):
   * genuinely-new rows of `batch` vs the index at `storeDir`, in-batch
   * winners elected per fingerprint, appended to the index. Returns
   * the appended winners.
   */
  def processBatch(batch: DataFrame, storeDir: String, idCol: String,
      textCol: String, expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val spark = batch.sparkSession
    val stored = readIndex(spark, storeDir, idCol)
    val fresh = graft.pipeline.Dedup.bloomDedupNewFp(
      stored.select(col("fp")), batch, idCol, textCol,
      expectedItems, numBits)
    // min-id election per fp: duplicates WITHIN the batch collapse too
    val winners = fresh.groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fp"))
      .transform(graft.CacheScope.persist(_)) // write + caller both consume
    winners.write.mode("append").parquet(storeDir)
    winners
  }

  /** Launch the loop over a streaming document frame. */
  def run(stream: DataFrame, storeDir: String, checkpointDir: String,
      idCol: String, textCol: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, storeDir, idCol, textCol)
        graft.CacheScope.drainRegistered()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
