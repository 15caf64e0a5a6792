package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/**
 * Boundary-proof decimal quantization, shared by every oracle-faced
 * rational output (Spark query side and DuckDB oracle side alike).
 *
 * `round(p/q, k)` is NOT portable across engines when `p/q * 10^k`
 * lands exactly on a half — possible iff the reduced denominator q
 * divides 2*10^k but not 10^k (i.e. q carries a 2^(k+1) factor; e.g.
 * 23/32 at k=4 -> 7187.5). Spark's round() is BigDecimal HALF_UP over
 * the double's decimal expansion, DuckDB's round() resolves the binary
 * tie differently, and the round-3 correctness gate failed on exactly
 * this (q_token_entropy ttr = n_types/n_tokens, q_multimodal_features
 * mean_byte = byte_sum/n_bytes — VERDICT.md round 3).
 *
 * `floor(x * 10^k + 0.5) / 10^k` is the identical IEEE-double
 * computation on both engines: at a true rational tie, x*10^k is
 * dyadic, hence exactly representable, and both floors agree; away
 * from the tie it equals round(). The same trick was already proven
 * in-repo for int8 quantization (Similarity.quantizeInt8).
 *
 * Law recorded for future rounds: NEVER use round() in an oracle-faced
 * output or threshold — use [[quant]] / [[quantSql]] on BOTH sides.
 * PortableQuantSpec enforces the SQL half by scanning oracleSql.
 */
object Portable {

  private def pow10(k: Int): Double = math.pow(10.0, k)

  /** Half-up quantization of a double column to `k` decimals with the
    * identical computation law in Spark, Java, and DuckDB. */
  def quant(c: Column, k: Int): Column =
    floor(c * lit(pow10(k)) + lit(0.5)) / lit(pow10(k))

  /** Same law on a raw double (driver-side conveniences, specs). */
  def quant(x: Double, k: Int): Double =
    math.floor(x * pow10(k) + 0.5) / pow10(k)

  /** The same law as a DuckDB SQL fragment for SparkEntry.oracleSql. */
  def sql(expr: String, k: Int): String = {
    val s = pow10(k).toLong
    s"floor(($expr) * $s.0 + 0.5) / $s.0"
  }

  /** 2^30 — the order-independent summation grid (see [[dyadic]]). */
  val DyadicScale: Double = 1073741824.0

  /**
   * Floor onto the dyadic 2^-30 lattice — the ORDER-INDEPENDENT float
   * summation law. A float groupBy-sum is not reproducible across
   * engines (or even Spark runs): partial-aggregation order differs,
   * and IEEE addition doesn't associate, so iterative pipelines
   * (PageRank supersteps, k-means centroids) drift by an ulp per
   * round and eventually straddle a [[quant]] boundary (observed:
   * q_pagerank at sf0.1, one vertex off by 1e-6). Summands floored to
   * multiples of 2^-30 fix this: every partial sum of <2^23 terms
   * with |x| < 2^10 is an exact multiple of 2^-30 below 2^53, so NO
   * addition ever rounds — any summation order, any partitioning, any
   * engine produces the identical bit pattern. (At larger per-group
   * cardinality×magnitude, widen the grid: exactness needs
   * n·max|x|·2^30 < 2^53.)
   */
  def dyadic(c: Column): Column =
    floor(c * lit(DyadicScale)) / lit(DyadicScale)

  /** The dyadic law as a DuckDB fragment (use on the summand INSIDE
    * the oracle's sum, mirroring the Spark side). */
  def dyadicSql(expr: String): String =
    s"floor(($expr) * 1073741824.0) / 1073741824.0"
}
