package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling for hot keys. The reference shards work per partition
 * and caps per-vertex fan-out, but a power-law graph still concentrates
 * a celebrity vertex's edges in one part; in Spark the equivalent
 * hazard is one reducer owning the hot key's whole group.
 *
 * Two mitigations compose here:
 *  - AQE skew-join splitting (enabled in session config) fixes skewed
 *    joins at runtime;
 *  - salted two-stage aggregation fixes skewed groupBy: stage 1
 *    aggregates on (key, salt) — spreading the hot key over
 *    `saltFactor` reducers — stage 2 merges the partials per key.
 *
 * Only algebraic aggregates (sum/count/min/max — and avg via
 * sum+count) can two-stage this way; that is exactly the reference's
 * stat surface (src/storage/exec/AggregateNode.h:71-88).
 */
object Skew {

  /** Deterministic salt derived from row content (no rand(): keeps
    * retries/replays idempotent). */
  private def salt(saltFactor: Int, on: Column): Column =
    pmod(hash(on), lit(saltFactor))

  final case class Agg(prop: String, stat: String, alias: String)

  /**
   * groupBy(key).agg(...) with the hot-key group pre-split across
   * `saltFactor` partial reducers. `saltOn` should be a column that
   * varies within a group (the neighbor id, the rank).
   */
  def saltedAgg(df: DataFrame, key: String, saltOn: String,
      saltFactor: Int, aggs: Seq[Agg]): DataFrame = {
    val partials = aggs.map { a =>
      val c = col(a.prop)
      a.stat.toLowerCase match {
        case "sum" => sum(c).as(s"p_${a.alias}")
        case "count" =>
          count(if (a.prop == "*") lit(1) else c).as(s"p_${a.alias}")
        case "min" => min(c).as(s"p_${a.alias}")
        case "max" => max(c).as(s"p_${a.alias}")
        case "avg" => // decompose: merged at stage 2 as sum/count
          struct(sum(c).as("s"), count(c).as("n")).as(s"p_${a.alias}")
        case other => throw new IllegalArgumentException(s"stat $other")
      }
    }
    val stage1 = df
      .groupBy(col(key), salt(saltFactor, col(saltOn)).as("_salt"))
      .agg(partials.head, partials.tail: _*)
    val finals = aggs.map { a =>
      val p = col(s"p_${a.alias}")
      a.stat.toLowerCase match {
        case "sum" => sum(p).as(a.alias)
        case "count" => sum(p).as(a.alias)
        case "min" => min(p).as(a.alias)
        case "max" => max(p).as(a.alias)
        case "avg" => (sum(p.getField("s")) / sum(p.getField("n"))).as(a.alias)
      }
    }
    stage1.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }

  /**
   * Skew report — the diagnostic that DECIDES whether the mitigations
   * above are needed: the k heaviest values of a prospective join/group
   * key with exact counts and integer-permille share of the table. A
   * key whose top entry holds >50‰ is a salting/AQE-skew candidate;
   * flat top-k means plain hash partitioning is fine. This is the
   * profiling pass a 100 TB pipeline runs BEFORE choosing a partition
   * strategy, kept as a first-class operator so it rides the same
   * gate as everything else.
   *
   * Scale shape: one map-side-combinable count shuffle (the corpus
   * collapses to the key cardinality), top-k via TakeOrderedAndProject
   * on the count frame (never a global sort of the data), total rides
   * a broadcast one-row scalar. All-integer output.
   */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .transform(graft.CacheScope.persist(_)) // feeds total + top-k
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000 div n_total").as("permille"),
        col("n_total"))
  }
}
