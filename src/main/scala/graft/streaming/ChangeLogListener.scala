package graft.streaming

import graft.operators.Mutations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Change-log listener — the Spark analog of the reference's raft-WAL
 * Listener (src/kvstore/Listener.h:54-105) and its one production
 * implementation, the Elasticsearch full-text sync
 * (src/kvstore/plugins/elasticsearch/ESListener.cpp): tail committed
 * mutations in log order, decode each batch, apply it to a derived
 * index table, and durably remember the last applied position.
 *
 * Change records carry `(seq bigint, op 'put'|'del', key cols...,
 * payload cols...)`. Semantics per committed batch match the Listener's
 * in-order replay: the NET effect of a batch on a key is its LAST
 * operation by `seq` (an earlier put superseded by a later del deletes;
 * puts upsert last-writer-wins). [[applyChanges]] is that merge as a
 * pure snapshot-in → snapshot-out transform (oracle-checkable);
 * [[ChangeLogListener.listen]] runs it under Structured Streaming:
 * `foreachBatch` is the committed-batch callback, the stream
 * checkpoint persists source offsets (the lastApplied-logId the
 * Listener keeps in its part file), and each batch writes a new
 * versioned parquet snapshot — re-running a failed batch overwrites
 * its own version, so recovery is idempotent, the job-commit
 * atomicity that replaces the reference's bulk-put + commitLogId dance.
 */
object ChangeLogListener {

  /** Net-effect merge of one committed change batch into a snapshot. */
  def applyChanges(existing: DataFrame, changes: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    // last operation per key wins — an interleaved put..del..put replays
    // to its final state, exactly like the Listener's ordered apply
    val lastOp = changes.withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("seq").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val dels = lastOp.filter(col("op") === "del")
      .select(keyCols.map(col): _*)
    val puts = lastOp.filter(col("op") === "put")
    Mutations.addRows(
      Mutations.deleteRows(existing, dels, keyCols),
      puts, keyCols, ifNotExists = false)
  }

  /**
   * Incremental view maintenance of a per-key (count, sum) aggregate:
   * apply a row-level delta changelog (`opCol` 'ins'|'del', each row
   * carrying its `valCol`) to the pre-aggregated base — the derived
   * table the Listener keeps in sync WITHOUT re-reading the fact table.
   * Count and sum are the self-maintainable aggregates (inserts add,
   * deletes subtract; min/max are not maintainable under deletes
   * without the base rows, which is why they're excluded here).
   *
   * Scale shape: the delta pre-aggregates to one row per touched key
   * (map-side combinable), then a full-outer join against the base
   * AGGREGATE (|keys| rows, not |facts|). At 100 TB this is the
   * difference between an O(|delta|) nightly merge and an O(|facts|)
   * recompute. Keys whose count reaches zero drop out (the tombstone
   * rule). `valCol` must be integral (cast long) so base + delta sums
   * are exact — IEEE float sums would drift from a fresh recompute.
   */
  def maintainAgg(baseAgg: DataFrame, delta: DataFrame, keyCol: String,
      opCol: String, valCol: String,
      cntCol: String, sumCol: String): DataFrame = {
    val sign = when(col(opCol) === "ins", lit(1L)).otherwise(lit(-1L))
    val d = delta.groupBy(col(keyCol)).agg(
      sum(sign).as("_dc"),
      sum(sign * col(valCol).cast("long")).as("_ds"))
    baseAgg.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("_dc"), lit(0L)))
          .as(cntCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("_ds"), lit(0L)))
          .as(sumCol))
      .filter(col(cntCol) > 0)
  }

  /**
   * Incremental JOIN-view maintenance for insert-only deltas — the
   * join companion to [[maintainAgg]]'s aggregate maintenance (the
   * classical delta rule, Blakeley et al. 1986 "Efficiently Updating
   * Materialized Views"): for V = A ⋈ B with arriving batches ΔA, ΔB,
   *
   *   ΔV = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
   *
   * — the rows a refresh job ships to the stored view WITHOUT
   * rejoining the two base tables. Multiset-exact: ΔV ≡
   * (A∪ΔA) ⋈ (B∪ΔB) − A ⋈ B (gate-checked via EXCEPT ALL).
   *
   * Scale shape: the delta sides are batch-sized, so both mixed terms
   * broadcast the delta against the base table's scan (no base-table
   * shuffle, no base⋈base recompute — THE point of IVM at 100 TB);
   * ΔA ⋈ ΔB is delta×delta. The base tables are read once each.
   */
  def ivmJoinDelta(a: DataFrame, da: DataFrame, b: DataFrame,
      db: DataFrame, key: String): DataFrame =
    b.join(broadcast(da), key)
      .unionByName(a.join(broadcast(db), key))
      .unionByName(broadcast(da).join(broadcast(db), key))
      .select(da.columns.map(col).toIndexedSeq ++
        b.columns.filter(_ != key).map(col): _*)
}

/** Streaming wrapper: maintains versioned parquet snapshots of the
  * index table at `indexPath` from a change-record stream. */
final class ChangeLogListener(indexPath: String,
    keyCols: Seq[String]) extends Serializable {

  /** Committed snapshot versions. Listing goes through the Hadoop
    * FileSystem of the path's own scheme (java.io.File would silently
    * return empty on hdfs:// or s3://, making every batch merge into an
    * empty base). A version counts as committed only once the job
    * committer's _SUCCESS marker exists — a write that died mid-batch
    * leaves no marker and is invisible to readers and to the next
    * merge. */
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

  /** Latest committed snapshot (None before the first batch). */
  def currentIndex(spark: SparkSession): Option[DataFrame] =
    versions(spark).lastOption.map(v =>
      spark.read.parquet(s"$indexPath/v$v"))

  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val payload = batch.drop("seq", "op")
    // The merge base is the latest committed version STRICTLY BELOW
    // this batch: after a failure between the parquet write and the
    // stream-checkpoint commit, foreachBatch replays batchId with
    // v<batchId> already on disk — taking currentIndex as the base
    // would read from and overwrite the same path (Spark refuses:
    // permanent crash-loop). Versions < batchId replay to the identical
    // result, which is the idempotence the Listener contract needs.
    val existing = versions(spark).filter(_ < batchId).lastOption
      .map(v => spark.read.parquet(s"$indexPath/v$v"))
      .getOrElse(payload.filter(lit(false)))
    ChangeLogListener.applyChanges(existing, batch, keyCols)
      .write.mode("overwrite").parquet(s"$indexPath/v$batchId")
  }

  /** Start tailing: one foreachBatch call per committed micro-batch. */
  def listen(changes: DataFrame, checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(applyBatch _)
      .start()
}
