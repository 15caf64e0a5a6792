package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/**
 * Per-vertex edge sampling — the reference samples exactly-k edges per
 * input vertex with a streaming reservoir when `random=true`
 * (reference: src/storage/exec/GetNeighborsNode.h:125-189, using
 * nebula::algorithm::ReservoirSampling).
 *
 * Two Spark-first formulations:
 *  - [[hashSamplePerGroup]]: deterministic "random" top-k by a
 *    multiplicative hash of the edge key — same selection law
 *    (uniform-ish over the group), fully reproducible, and expressible in
 *    ANSI SQL for the DuckDB oracle. One window shuffle, scale-safe.
 *  - [[ReservoirAgg]]: exact-k uniform sampling as a typed
 *    `Aggregator` via deterministic bottom-k priorities — the
 *    distributed statement of the reference's streaming reservoir
 *    (merge is a k-way min-merge: partition-count-invariant, seeded).
 */
object Sample {

  /** Knuth multiplicative constant; fits comfortably in int64 for the
    * key ranges in play. */
  val HashA = 2654435761L
  val HashM = 4294967296L // 2^32

  /** Deterministic pseudo-random rank: (key * A) mod 2^32. */
  def hashRank(key: Column): Column = pmod(key * lit(HashA), lit(HashM))

  /**
   * Exactly-k-per-group deterministic sample: order the group by the
   * multiplicative hash of `rankOn` (the caller's sampling key — e.g.
   * the neighbor id for GetNeighbors), take k. `tieBreak` columns make
   * row_number total.
   */
  def hashSamplePerGroup(df: DataFrame, groupCol: String, rankOn: Column,
      tieBreak: Seq[Column], k: Int): DataFrame = {
    val rankKey = hashRank(rankOn)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(rankKey +: tieBreak: _*)
    df.withColumn("_srn", row_number().over(w))
      .filter(col("_srn") <= k).drop("_srn")
  }

  /**
   * Exact-k uniform sample as deterministic bottom-k priorities
   * (min-wise sampling, the distributed statement of the reference's
   * streaming reservoir): every element draws the fixed priority
   * `byteswap64(seed ^ byteswap64(v))` — a seeded bijective mix, the
   * random-oracle stand-in — and the k smallest (priority, value)
   * pairs win. `reduce` is a bounded insert, `merge` a pure k-way
   * min-merge, so the result is a function of the SET of values
   * alone: partition-count-invariant, retry-stable, and exactly
   * uniform over distinct values (every k-subset equally likely under
   * the mix). Duplicate values collapse to one candidate (set
   * semantics — the sample is of the value domain, as for neighbor
   * ids).
   */
  final case class Reservoir(k: Int, seed: Long, seen: Long,
      items: Vector[(Long, Long)])

  class ReservoirAgg(k: Int, seed: Long)
      extends Aggregator[Long, Reservoir, Seq[Long]] {
    import scala.util.hashing.byteswap64

    private def priority(v: Long): Long = byteswap64(seed ^ byteswap64(v))

    override def zero: Reservoir = Reservoir(k, seed, 0L, Vector.empty)

    override def reduce(b: Reservoir, v: Long): Reservoir = {
      val p = (priority(v), v)
      val seen = b.seen + 1
      if (b.items.contains(p)) b.copy(seen = seen)
      else if (b.items.size < k)
        b.copy(seen = seen, items = (b.items :+ p).sorted)
      else if (Ordering[(Long, Long)].lt(p, b.items.last))
        b.copy(seen = seen, items = (b.items.init :+ p).sorted)
      else b.copy(seen = seen)
    }

    override def merge(a: Reservoir, c: Reservoir): Reservoir =
      Reservoir(k, a.seed, a.seen + c.seen,
        (a.items ++ c.items).distinct.sorted.take(k))

    override def finish(r: Reservoir): Seq[Long] = r.items.map(_._2)
    override def bufferEncoder = Encoders.product[Reservoir]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form of the reservoir aggregate. */
  def reservoir(c: Column, k: Int, seed: Long = 42L): Column =
    udaf(new ReservoirAgg(k, seed), Encoders.scalaLong)(c)

  /**
   * Exactly-k-per-stratum deterministic sample: rank rows inside each
   * stratum by the md5 of their id (a uniform, engine-portable,
   * replayable ordering — no `rand()`, so retries and the SQL oracle see
   * the identical sample) and keep the first k. Plans as
   * WindowGroupLimit: each map task keeps at most k rows per stratum
   * before the shuffle, so quota sampling a 100 TB corpus moves only
   * ~k·|strata| rows per task, not the corpus.
   */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_srn", row_number().over(w))
      .filter(col("_srn") <= k).drop("_srn")
  }

  /**
   * Weighted sampling without replacement, k per group — the
   * Efraimidis–Spirakis A-ES scheme: each row draws u ∈ (0,1] and the
   * k rows maximizing u^(1/w) win; inclusion probability is
   * proportional to weight. We rank by the monotone-equivalent
   * ln(u)/w (avoids pow) and derive u from md5(id) — 52 hash bits →
   * exact double — so the draw is replayable, retry-stable, and
   * engine-portable like [[stratified]]. Plans as WindowGroupLimit:
   * map-side top-k per group before the single shuffle, the property
   * that makes weighted corpus sampling move k·|groups| rows, not the
   * corpus. Weights must be > 0.
   */
  def weightedByGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double")
    val u = (h + 1.0) / 4503599627370496.0 // (0,1], 2^52 buckets
    val key = log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(key.desc, col(idCol))
    df.withColumn("_srn", row_number().over(w))
      .filter(col("_srn") <= k).drop("_srn")
  }
}
