package graft.operators

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text match surface. The reference offloads text predicates to an
 * external Elasticsearch cluster kept in sync by a raft listener
 * (reference: src/kvstore/plugins/elasticsearch/ESListener.cpp,
 * src/common/plugin/fulltext/elasticsearch/ESGraphAdapter.cpp builds
 * prefix/wildcard/regexp/fuzzy query DSL); here the same four match
 * kinds run inside the engine as plan-native predicates.
 *
 * Scale notes: prefix compiles to `StartsWith`, which reaches the
 * parquet scan as a pushed filter (min/max + dictionary pruning);
 * wildcard/regexp are codegen'd scan-local predicates (no shuffle).
 * Fuzzy evaluates Levenshtein against the DISTINCT tokens of each row
 * (array_distinct first — documents repeat words), still a narrow
 * single-pass filter: no explode, no shuffle, no index build. A
 * dedicated inverted index (the reference's ES role) belongs in a
 * pre-materialized table when corpus-wide term lookup dominates;
 * `BucketedStore.rebuildIndex` is that path's storage shape.
 */
object TextSearch {

  /** `column` starts with `p` (pushed down to the scan). */
  def prefix(df: DataFrame, column: String, p: String): DataFrame =
    df.where(col(column).startsWith(p))

  /** SQL LIKE pattern (`%`, `_`). */
  def wildcard(df: DataFrame, column: String, pattern: String): DataFrame =
    df.where(col(column).like(pattern))

  /** Regular-expression containment match. */
  def regexp(df: DataFrame, column: String, pattern: String): DataFrame =
    df.where(col(column).rlike(pattern))

  /** Rows where any distinct lower-cased alphanumeric token of `column`
    * is within `maxDist` Levenshtein edits of `term`. */
  def fuzzy(df: DataFrame, column: String, term: String, maxDist: Int)
      : DataFrame =
    df.where(fuzzyHit(col(column), term, maxDist))

  def fuzzyHit(text: Column, term: String, maxDist: Int): Column =
    exists(array_distinct(TextAnalysis.terms(text)),
      t => levenshtein(t, lit(term)) <= maxDist)
}
