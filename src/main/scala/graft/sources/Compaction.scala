package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Small-file compaction PLANNER — the metadata half of the reference's
 * CompactTask (src/storage/admin/AdminTaskManager.cpp triggers a
 * full-store RocksDB compaction; BucketedStore.compact is this repo's
 * data-path analog). At 100 TB the hard part is not rewriting bytes,
 * it is deciding WHICH files coalesce into which output: streaming
 * ingest (IngestDedup's per-micro-batch parquet appends) leaves
 * thousands of KB-sized files per partition, and a naive "rewrite the
 * whole table" compaction is a 100 TB shuffle for a metadata problem.
 *
 * [[plan]] is the bin-packing Delta/Iceberg `OPTIMIZE` uses: within
 * each table partition, order files and cut a new output bin every
 * time the running size crosses the target — each bin becomes one
 * coalesce-rewrite task touching only its own files. The planning
 * frame is file METADATA (one row per file — ~10^6 rows for 100 TB,
 * never the data), and the window partitions by table-partition, so
 * no reducer sees more than one partition's file list (bounded by the
 * layout, ~10^3-10^5 files). Oversized files land alone in their bin
 * and are skipped by the rewriter (already compact).
 */
object Compaction {

  /**
   * Assign every file to an output bin: files ordered by `fileCol`
   * within `groupCol`, bin = exclusive-prefix-size div `targetBytes`.
   * Emits (group, file, size, bin, bin_rows-style diagnostics) — the
   * rewrite job then groups by (group, bin) and coalesces each bin
   * into one output file of ≈ targetBytes.
   */
  def plan(files: DataFrame, groupCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    val before = Window.partitionBy(col(groupCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(col(groupCol), col(fileCol),
        col(sizeCol).cast("long").as(sizeCol))
      .withColumn("_cum_before",
        coalesce(sum(col(sizeCol)).over(before), lit(0L)))
      .select(col(groupCol), col(fileCol), col(sizeCol),
        (col("_cum_before") / lit(targetBytes)).cast("long").as("bin"))
  }

  /** Per-bin rollup of [[plan]]: what the rewrite scheduler consumes —
    * one task per (group, bin) with its file count and total bytes;
    * `compactable` marks bins that actually shrink the file count. */
  def planSummary(files: DataFrame, groupCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame =
    plan(files, groupCol, fileCol, sizeCol, targetBytes)
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bytes"))
      .withColumn("compactable", (col("n_files") > 1).cast("int"))
}
