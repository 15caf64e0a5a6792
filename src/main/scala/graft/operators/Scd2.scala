package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) surface over a keyed changelog —
 * the batch/warehouse statement of the reference's versioned-edge
 * semantics: a nebula edge key carries an explicit version dimension
 * (`src/utils/NebulaKeyUtils.cpp` rank byte) and readers see the row
 * version visible at their read timestamp, while the change stream
 * itself is the raft-WAL Listener feed (`src/kvstore/Listener.h`) that
 * [[graft.streaming.ChangeLogListener]] replays for net effect. Here
 * the full history is first-class: each key's put/del log becomes
 * half-open validity intervals, and facts join to the dimension version
 * that was live at THEIR time, not the current one.
 *
 * Scale notes:
 *  - [[intervals]] is ONE window shuffle on the dimension key (lead()
 *    over the per-key seq order). Changelogs are dimension-sized, not
 *    fact-sized, so this is the cheap side at 100 TB.
 *  - [[pointInTime]] deliberately does NOT join facts to the interval
 *    table with a `valid_from <= t < valid_to` range predicate — the
 *    range join materializes |facts| x |versions-per-key| candidates
 *    before pruning. It reuses [[TemporalJoin.asOfBackward]]: facts and
 *    changelog union into one time-sorted stream, a running
 *    last(ignoreNulls) carries the latest version forward, and a delete
 *    marker rides the same stream (it simply carries a tombstone op, so
 *    facts after it unmatch). One shuffle on the key, zero
 *    row-multiplication, hot fact keys cost rows-per-key not
 *    rows-squared.
 */
object Scd2 {

  /**
   * Half-open validity intervals from a keyed changelog. `changes` has
   * `keyCol`, a monotonically increasing per-key `seqCol` (version
   * stamp: commit seq, event time...), `opCol` in {put, del}, and the
   * payload. Output: one row per PUT version with `valid_from` = its
   * seq and `valid_to` = the next change's seq for that key (null =
   * still current; a del closes the prior put's interval and emits no
   * row of its own). `is_current` flags open intervals.
   */
  def intervals(changes: DataFrame, keyCol: String, seqCol: String,
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) === "put")
      .select(col(keyCol) +: payloadCols.map(col) :+
        col(seqCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.cast("int").as("is_current"): _*)
  }

  /**
   * Point-in-time join: every fact row gets the dimension payload that
   * was live at the fact's `factSeq` (latest change with
   * `seq <= factSeq`; a delete as the latest change, or no change at
   * all, yields null payload and `matched` = 0). Facts keep all their
   * columns; payload columns and the 0/1 `matched` flag are appended.
   */
  def pointInTime(facts: DataFrame, factKey: String, factSeq: String,
      changes: DataFrame, keyCol: String, seqCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val factCols = facts.columns.toSeq
    val joined = TemporalJoin.asOfBackward(
      facts, changes.withColumnRenamed(keyCol, "_dim_key"),
      leftKey = factKey, rightKey = "_dim_key",
      leftTime = factSeq, rightTime = seqCol, rightTieBreak = seqCol,
      rightCols = payloadCols :+ opCol)
    val live = col(opCol) === "put"
    joined.select(factCols.map(col) ++
      payloadCols.map(c => when(live, col(c)).as(c)) :+
      coalesce(live.cast("int"), lit(0)).as("matched"): _*)
  }
}
