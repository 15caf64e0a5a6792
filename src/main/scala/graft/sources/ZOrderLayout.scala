package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering for multi-dimensional data
 * skipping — the at-rest layout that makes file-level min/max
 * statistics prune on SEVERAL columns at once.
 *
 * The reference prunes on exactly one axis: its RocksDB key prefix
 * (part, vid/src) — a scan filtered on any non-key column reads every
 * SST (src/storage/exec/IndexScanNode.cpp builds one PREFIX + at most
 * one trailing RANGE, nothing multi-dimensional). A 100 TB lake needs
 * better: when each parquet file covers a small RECTANGLE of
 * (x, y) space rather than a thin slab of x alone, a 2-D box
 * predicate skips the overwhelming majority of files on BOTH
 * dimensions' min/max stats. Interleaving the bits of the sort key
 * (the Morton curve) is how Delta/Iceberg `OPTIMIZE ZORDER BY` get
 * that rectangle property; here it is a pure Catalyst bit expression
 * (shift/and/or — whole-stage codegen, no UDF).
 *
 * Scale design: [[zValue]] is a narrow per-row expression; the only
 * shuffle in [[writeZOrdered]] is the range partition on the z-value
 * (exactly the shuffle any global sort pays), and the skipping audit
 * is two aggregations over a row_number window keyed by the layout
 * order — one pass per layout, no joins.
 */
object ZOrderLayout {

  /**
   * Morton z-value: interleave the low `bits` bits of each column.
   * Bit `b` of column `j` lands at position `b * ncols + j`, so equal
   * prefixes of the z-value pin equal-size ranges of EVERY input
   * column. Columns must already be non-negative integers below
   * 2^bits (callers bucket or rank first); `ncols * bits` must fit a
   * signed 64-bit value.
   */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"ncols*bits = ${cols.size * bits} must be in [1, 63]")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Inverse of [[zValue]] for column `j`: gather bits `b*nCols + j`
    * back into a plain integer — the decode a range-sharded rebalancer
    * or a debugging scan needs to recover coordinates from a stored
    * z-key without carrying the original columns. */
  def zDecode(z: Column, nCols: Int, bits: Int, j: Int): Column = {
    require(nCols >= 1 && j >= 0 && j < nCols && bits >= 1 &&
      nCols * bits <= 63, s"bad decode geometry ($nCols, $bits, $j)")
    (0 until bits).map(b =>
      shiftleft(shiftright(z, b * nCols + j).bitwiseAND(lit(1L)), b))
      .reduce(_.bitwiseOR(_))
  }

  /** DuckDB rendering of the exact same interleave, for oracle SQL. */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /**
   * Write `df` z-ordered on `zCols` into ~`files` parquet files:
   * range-partition on the z-value (one shuffle — the same one a
   * global sort pays) and sort within each partition, so every file's
   * min/max footer stats cover a compact Morton range = a small
   * rectangle per dimension.
   */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int, files: Int): Unit =
    df.withColumn("_z", zValue(zCols.map(col), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /**
   * Deterministic data-skipping audit: simulate the file layout (file
   * k = rows [k*rowsPerFile, (k+1)*rowsPerFile) of the layout order),
   * compute each file's (min,max) footer stats for both dimensions,
   * and count how many files a 2-D box predicate must read under
   *  (a) `linear`  — sorted by (x, y, id), the single-axis layout, and
   *  (b) `zorder`  — sorted by (zValue(x, y), id).
   * Output: one row per layout with files_total / files_hit — the
   * integers a 100 TB capacity plan actually needs. The simulation is
   * exact for parquet row-group pruning and engine-independent, so it
   * gates against the DuckDB oracle (real footer stats would not).
   *
   * The global rank that assigns rows to files is the repo's standard
   * two-level prefix sum (tokenBudgetTrim's shape), NOT one
   * unpartitioned row_number window: rows rank locally inside a
   * coarse bucket that is a PREFIX of the total order (x for the
   * linear layout, the z-value's high bits for z-order), and a window
   * over the tiny bucket-count frame turns counts into exclusive
   * offsets — so the corpus-sized pass is parallel across buckets and
   * only O(2^bits) rows ever cross one reducer.
   */
  /**
   * Range-partitioner boundary planning — the driver step of every
   * global sort / sorted write at scale (Spark's RangePartitioner does
   * exactly this with a reservoir sample; TeraSort's partition file is
   * the classic form): a DETERMINISTIC hash-sample of the key column
   * (md5(key) mod sampleMod == 0 — replayable, partition-count
   * invariant), then the nParts−1 exact rank quantiles OF THE SAMPLE
   * become the range boundaries. Output (part_id, boundary_key):
   * partition i takes keys in (boundary(i−1), boundary(i)].
   *
   * Scale shape: the corpus is touched once by the narrow hash filter;
   * the global rank window runs on the SAMPLE (corpus/sampleMod rows —
   * the bounded frame where a global order is affordable), and the
   * boundary-position join is a broadcast of nParts−1 rows. The full
   * table is never globally sorted to PLAN the sort.
   */
  def rangeBounds(df: DataFrame, keyCol: String, sampleMod: Int,
      nParts: Int): DataFrame = {
    require(sampleMod >= 1 && nParts >= 2, "sampleMod >= 1, nParts >= 2")
    import org.apache.spark.sql.expressions.Window
    val sample = df.select(col(keyCol).as("k"))
      .filter(conv(substring(md5(col("k").cast("string")), 1, 8), 16, 10)
        .cast("long") % sampleMod === 0)
    val ranked = sample
      .withColumn("r", row_number().over(Window.orderBy(col("k"))))
    val n = sample.agg(count(lit(1)).as("n_sample"))
    val spark = df.sparkSession
    import spark.implicits._
    val parts = (1 until nParts).map(_.toLong).toDF("part_id")
      .crossJoin(broadcast(n))
      .select(col("part_id"),
        expr("part_id * n_sample div " + nParts).as("pos"))
    ranked.join(broadcast(parts), col("r") === col("pos"))
      .select(col("part_id"), col("k").as("boundary_key"))
  }

  def skippingAudit(df: DataFrame, xCol: String, yCol: String,
      idCol: String, bits: Int, rowsPerFile: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    def audit(layout: String, bucket: Column,
        localOrder: Seq[Column]): DataFrame = {
      val rows = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"), col(idCol).as("id"))
        .withColumn("_bkt", bucket)
      val offsets = rows.groupBy(col("_bkt"))
        .agg(count(lit(1)).as("_n"))
        .withColumn("_off", coalesce(sum(col("_n")).over(
          Window.orderBy(col("_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("_bkt"), col("_off"))
      val localW = Window.partitionBy(col("_bkt")).orderBy(localOrder: _*)
      rows.join(offsets, Seq("_bkt"))
        .withColumn("file",
          ((col("_off") + row_number().over(localW) - lit(1)) /
            lit(rowsPerFile.toLong)).cast("long"))
        .groupBy(col("file"))
        .agg(min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .agg(count(lit(1)).as("files_total"),
          sum(when(col("x_min") <= lit(xHi) && col("x_max") >= lit(xLo) &&
            col("y_min") <= lit(yHi) && col("y_max") >= lit(yLo), 1L)
            .otherwise(0L)).as("files_hit"))
        .select(lit(layout).as("layout"), col("files_total"),
          col("files_hit"))
    }
    // Coarse z bucket = the top interleaved bits (shift keeps ≥64
    // buckets); it is a monotone prefix of z, so bucket-then-(z, id)
    // equals the single total order (z, id).
    val zShift = math.max(2 * bits - 12, 2)
    val z = zValue(Seq(col("x"), col("y")), bits)
    audit("linear", col("x"), Seq(col("y"), col("id")))
      .unionAll(audit("zorder", shiftright(z, zShift),
        Seq(z, col("id"))))
  }
}
