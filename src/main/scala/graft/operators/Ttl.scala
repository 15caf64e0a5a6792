package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * TTL — the reference's only time-based semantic: a row whose
 * `ttl_col + ttl_duration` has passed is invisible to every read path
 * (reference: CommonUtils::checkDataExpiredForTTL in src/storage/
 * CommonUtils.cpp, applied at src/storage/exec/TagNode.h:99-107,
 * StorageIterator.h:91-105, IndexScanNode.h:74-93) and physically purged
 * at compaction (src/storage/CompactionFilter.h:25-57).
 *
 * Spark-first: visibility is a filter every reader composes in — a plain
 * predicate Catalyst pushes to the scan (at scale: partition-prune on a
 * date-derived partition column). The compaction purge becomes a
 * retention rewrite job ([[purge]]).
 */
object Ttl {

  /** Visibility predicate: alive iff ttlCol + duration > now. `now` is a
    * Column so tests/oracles can pin a deterministic clock. Interval
    * arithmetic keeps the comparison microsecond-exact (the reference
    * stores the TTL column as int64 seconds; our columns are true
    * timestamps). */
  def alive(ttlCol: Column, durationSec: Long, now: Column): Column =
    ttlCol + expr(s"INTERVAL $durationSec SECOND") > now

  /** Read-side TTL filter wrapped around any table. */
  def visible(df: DataFrame, ttlCol: String, durationSec: Long,
      now: Column): DataFrame =
    df.filter(alive(col(ttlCol), durationSec, now))

  /** Retention rewrite — the CompactionFilter's physical purge as a
    * batch job: keep only live rows (caller writes the result back). */
  def purge(df: DataFrame, ttlCol: String, durationSec: Long,
      now: Column): DataFrame =
    visible(df, ttlCol, durationSec, now)
}
