package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import scala.util.Random

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
 *  - [[ReservoirAgg]]: an exact streaming reservoir as a typed
 *    `Aggregator`, for callers that want the reference's literal
 *    algorithm (merge-able across partitions, seeded for test
 *    determinism).
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
   * Exact streaming reservoir sample of k Long ids, seeded. Partial
   * reservoirs merge by weighted re-draw, so the aggregate distributes
   * (unlike the reference's single-threaded reservoir it stays exact per
   * partition and approximately uniform across merges).
   */
  final case class Reservoir(k: Int, seed: Long, seen: Long,
      items: Vector[Long])

  class ReservoirAgg(k: Int, seed: Long)
      extends Aggregator[Long, Reservoir, Seq[Long]] {
    override def zero: Reservoir = Reservoir(k, seed, 0L, Vector.empty)

    override def reduce(b: Reservoir, v: Long): Reservoir = {
      val seen = b.seen + 1
      if (b.items.size < k) b.copy(seen = seen, items = b.items :+ v)
      else {
        // Deterministic per-element draw: seed ⊕ element ⊕ count.
        // floorMod, not .abs%: Long.MinValue.abs is negative, and
        // abs-then-mod doubles the low residues' probability.
        val r = new Random(b.seed ^ v ^ seen)
        val j = Math.floorMod(r.nextLong(), seen)
        if (j < k) b.copy(seen = seen, items = b.items.updated(j.toInt, v))
        else b.copy(seen = seen)
      }
    }

    override def merge(a: Reservoir, c: Reservoir): Reservoir = {
      val total = a.seen + c.seen
      if (a.items.size + c.items.size <= k)
        a.copy(seen = total, items = a.items ++ c.items)
      else {
        // Weighted merge: draw k from the union, weighting each side by
        // its seen-count, with a deterministic rng. NOTE: the rng
        // stream is consumed in pool order, so the draw is
        // deterministic for a FIXED partitioning but not
        // partition-count-invariant (statistically sound either way);
        // the hash-rank sampler below is the invariant, gate-checked
        // path — use it when bit-stable output across repartitions
        // matters.
        val r = new Random(a.seed ^ total)
        val pool = a.items.map(v => (v, a.seen)) ++ c.items.map(v => (v, c.seen))
        val drawn = pool
          .map { case (v, w) => (v, math.pow(r.nextDouble(), 1.0 / w)) }
          .sortBy(-_._2).take(k).map(_._1)
        Reservoir(k, a.seed, total, drawn.toVector)
      }
    }

    override def finish(r: Reservoir): Seq[Long] = r.items
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
