package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-ordered joins the built-in equi-join can't express efficiently:
 * as-of (latest right row at-or-before each left row) and banded range
 * join (all right rows inside a relative time window). Neither exists in
 * the reference (its scans return per-vertex edge lists in key order —
 * `src/storage/exec/MultiEdgeIterator` time-ranked edges are the closest
 * shape); both are table stakes for event/feature pipelines at scale, so
 * they get first-class scale-safe implementations here.
 *
 * Scale notes:
 *  - `asOfBackward` is ONE shuffle on the key: both sides union into a
 *    single time-sorted stream and a running `last(ignoreNulls)` window
 *    carries the most recent right payload forward. No join, no
 *    row-multiplication, no per-key collect — the naive
 *    `left JOIN right ON key AND r.ts <= l.ts` materializes
 *    |L|x|matched R| rows before its row_number prunes them, which dies
 *    on a 100 TB event log.
 *  - `banded` buckets the time axis at the window width: each left row
 *    joins at most two (key, bucket) cells instead of the whole key
 *    group, so a hot key's cost is bounded by rows-per-window, not
 *    rows-per-key. The exact predicate re-filters inside the bucket
 *    match; right rows land in exactly one bucket so no dedup is needed.
 */
object TemporalJoin {

  /**
   * For every left row, attach the single latest right row with the same
   * key and `right(rightTime) <= left(leftTime)` (backward as-of, ties
   * broken toward the larger `rightTieBreak` — deterministic last-writer).
   * Right payload columns are null when no right row precedes the left
   * row (left-outer semantics).
   */
  def asOfBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTieBreak: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lType = left.select(lStruct).schema.fields(0).dataType
    val rType = right.select(rStruct).schema.fields(0).dataType
    // the tiebreak keeps its NATIVE orderable type — a cast("long")
    // would turn e.g. a string event id into null and silently make the
    // documented last-writer tie-break nondeterministic
    val tbType = right.schema(rightTieBreak).dataType
    val l = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"), lit(null).cast(tbType).as("_tb"),
      lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow"))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightTieBreak).as("_tb"),
      lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow"))
    // At equal timestamps right rows (_side=0) sort first, so a left row
    // sees right rows with rightTime == leftTime (<= semantics).
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /**
   * All (left, right) pairs with equal keys and
   * `loUs <= rightTime - leftTime <= hiUs` (microseconds). Output is the
   * aliased left columns, right columns, and `gap_us`.
   */
  def banded(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      loUs: Long, hiUs: Long,
      leftCols: Seq[(String, String)], rightCols: Seq[(String, String)])
      : DataFrame = {
    require(hiUs > loUs, s"empty band [$loUs, $hiUs]")
    val w = math.max(hiUs - loUs, 1L)
    val l = left.select(
      col(leftKey).as("_k"), unix_micros(col(leftTime)).as("_lt"),
      struct(leftCols.map { case (c, a) => col(c).as(a) }: _*).as("_l"))
      // A [t+lo, t+hi] window of width w spans at most two w-buckets.
      .withColumn("_b", explode(sequence(
        floor((col("_lt") + loUs) / lit(w)).cast("long"),
        floor((col("_lt") + hiUs) / lit(w)).cast("long"))))
    val r = right.select(
      col(rightKey).as("_k"), unix_micros(col(rightTime)).as("_rt"),
      struct(rightCols.map { case (c, a) => col(c).as(a) }: _*).as("_r"))
      .withColumn("_b", floor(col("_rt") / lit(w)).cast("long"))
    val gap = col("_rt") - col("_lt")
    l.join(r, Seq("_k", "_b"))
      .where(gap >= loUs && gap <= hiUs)
      .select(
        (leftCols.map { case (_, a) => col(s"_l.$a").as(a) } ++
          rightCols.map { case (_, a) => col(s"_r.$a").as(a) }) :+
          gap.as("gap_us"): _*)
  }
}
