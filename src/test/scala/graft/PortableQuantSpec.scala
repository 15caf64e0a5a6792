package graft

import graft.functions.Portable

/**
 * Guards the repo-wide quantization law (Portable.scala): every
 * oracle-faced rational output is quantized with floor(x*10^k + 0.5),
 * never round(), because round()'s exact-half resolution differs
 * between Spark (BigDecimal HALF_UP) and DuckDB at values p/q whose
 * reduced denominator divides 2*10^k but not 10^k — the round-3
 * CORRECTNESS failures (q_token_entropy ttr, q_multimodal_features
 * mean_byte).
 */
class PortableQuantSpec extends SparkSpec {

  test("quant matches HALF_UP at exact 4-decimal half ties") {
    // the two round-3 failure values: 23/32 (ttr) and 95.09375 (mean_byte)
    assert(Portable.quant(23.0 / 32.0, 4) == 0.7188)
    assert(Portable.quant(95.09375, 4) == 95.0938)
    // dyadic ties across the 32-divisible family
    for (p <- 1 to 200 if p % 2 == 1) {
      val x = p / 32.0
      val q = Portable.quant(x, 4)
      val exp = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(q == exp, s"p/32 tie $p: quant=$q halfUp=$exp")
    }
  }

  test("quant equals round() away from ties") {
    val xs = Seq(0.0, 1.0, 0.123456, 3.14159, 12.34, 99.99995,
      0.33333333, 2.0 / 3.0, 1e7 + 0.12345)
    for (x <- xs; k <- Seq(2, 4, 6)) {
      val exp = BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      val got = Portable.quant(x, k)
      assert(math.abs(got - exp) < 1e-9, s"x=$x k=$k got=$got exp=$exp")
    }
  }

  test("quant handles negative rationals consistently (toward +inf at tie)") {
    // mean_log2p is negative; both engines apply the identical formula
    assert(Portable.quant(-23.0 / 32.0, 4) == -0.7187)
    assert(Portable.quant(-1.23456, 4) == -1.2346)
  }

  test("Column quant agrees with scalar quant on fixture-like values") {
    val s = spark
    import s.implicits._
    val xs = Seq(23.0 / 32.0, 95.09375, 0.123456, -0.71875, 2.0 / 3.0)
    val got = xs.toDF("x")
      .select(Portable.quant(org.apache.spark.sql.functions.col("x"), 4))
      .as[Double].collect().toSeq
    assert(got == xs.map(Portable.quant(_, 4)))
  }

  test("no oracle SQL uses round() — the law is enforced, not advisory") {
    val offenders = SparkEntry.oracleSql.filter { case (_, sql) =>
      "(?<![A-Za-z0-9_.])round\\(".r.findFirstIn(sql).isDefined
    }.keys.toSeq.sorted
    assert(offenders.isEmpty,
      s"oracle SQL must use Portable.sql-style floor quantization: $offenders")
  }

  test("dyadic summands sum to the identical bits in ANY order") {
    // the law PageRank/k-means rely on: floored to the 2^-30 lattice,
    // partial sums never round, so accumulation order cannot matter
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(20000)(rnd.nextDouble() * 100 - 50)
      .map(x => math.floor(x * Portable.DyadicScale) / Portable.DyadicScale)
    def sumIn(order: Seq[Int]): Double = {
      var s = 0.0
      order.foreach(i => s += xs(i))
      s
    }
    val fwd = sumIn(xs.indices)
    val rev = sumIn(xs.indices.reverse)
    val shuf = sumIn(rnd.shuffle(xs.indices.toVector))
    // paired partials, like Spark's partial/final aggregation
    val parts = xs.indices.grouped(97).map(sumIn).toSeq
    val merged = parts.sum
    assert(fwd == rev && fwd == shuf && fwd == merged,
      s"order-dependent: $fwd $rev $shuf $merged")
    // the UNfloored originals genuinely disagree across orders (the
    // hazard is real, not hypothetical)
    val raw = Array.fill(20000)(rnd.nextDouble() * 100 - 50)
    val rawFwd = raw.foldLeft(0.0)(_ + _)
    val rawRev = raw.reverse.foldLeft(0.0)(_ + _)
    assert(rawFwd != rawRev || rawFwd == 0.0,
      "fixture failed to exhibit order dependence (astronomically rare)")
  }

  test("every hand-written quant fragment is internally consistent") {
    // The silent-drift hazard ADVICE flagged on Portable.sql being
    // unused: a hand-inlined `floor((x) * A + 0.5) / B` with A != B,
    // or a non-power-of-10 scale, quantizes to a different lattice
    // than any Spark-side Portable.quant(_, k) can produce. Parse
    // every fragment and check A == B == 10^k.
    val frag =
      raw"(?s)floor\(\(.*?\)\s*\*\s*([0-9.]+)\s*\+\s*0\.5\)\s*/\s*([0-9.]+)".r
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      frag.findAllMatchIn(sql).collect {
        case m if m.group(1) != m.group(2) =>
          s"$name: *${m.group(1)} vs /${m.group(2)}"
        case m if !math.log10(m.group(1).toDouble).isWhole =>
          s"$name: non-power-of-10 scale ${m.group(1)}"
      }
    }
    assert(bad.isEmpty, s"drifted quant fragments: $bad")
  }
}
