package graft

import org.apache.spark.sql.functions._

/** Round-10 wave-7 operators: Louvain local moves, IVM join deltas,
  * AMS F2 sketch. */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  // two triangles bridged by one edge — the canonical community fixture
  private def triangles = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")

  test("louvainMove: a correct partition is stable (no moves)") {
    val init = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("v", "c")
    val out = graft.analytics.GraphAnalytics.louvainMove(triangles, init)
    assert(out.agg(sum("moved")).head().getLong(0) == 0L)
  }

  test("louvainMove: a misplaced vertex moves home, others stay") {
    val init = Seq((1L, 1L), (2L, 1L), (3L, 4L), // 3 planted wrong
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("v", "c")
    val out = graft.analytics.GraphAnalytics.louvainMove(triangles, init)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(3L) == ((1L, 1L)), "vertex 3 must rejoin community 1")
    assert(out.filter(_._1 != 3L).values.forall(_._2 == 0L),
      "no other vertex moves")
  }

  test("ivmJoinDelta equals the recompute difference as a multiset") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    def ords(p: org.apache.spark.sql.Column) = o.filter(p)
      .select(col("o_custkey").as("k"), col("o_orderkey"))
    def custs(p: org.apache.spark.sql.Column) = c.filter(p)
      .select(col("c_custkey").as("k"), col("c_nationkey"))
    val (a, da) = (ords(col("o_orderkey") % 5 =!= 0),
      ords(col("o_orderkey") % 5 === 0))
    val (b, db) = (custs(col("c_custkey") % 3 =!= 0),
      custs(col("c_custkey") % 3 === 0))
    val delta = graft.streaming.ChangeLogListener
      .ivmJoinDelta(a, da, b, db, "k")
    val recompute = a.unionByName(da).join(b.unionByName(db), "k")
      .exceptAll(a.join(b, "k"))
      .select(delta.columns.map(col).toIndexedSeq: _*)
    assert(delta.exceptAll(recompute).isEmpty &&
      recompute.exceptAll(delta).isEmpty)
    assert(delta.count() > 0, "fixture must exercise all three terms")
  }

  test("amsF2: parity law, median identity, and shard additivity") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    val full = graft.operators.Stats.amsF2(li, "l_partkey")
      .orderBy("i").collect()
    // each Z is a sum of n signs: |Z| <= n and Z ≡ n (mod 2)
    assert(full.forall(r => math.abs(r.getLong(1)) <= n &&
      ((r.getLong(1) - n) % 2 + 2) % 2 == 0))
    // est_f2 is the exact 3-row median of z2
    val z2s = full.map(_.getLong(2)).sorted
    assert(full.head.getLong(3) == z2s(1))
    // merge law: per-estimator Z adds across disjoint shards
    def zs(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Stats.amsF2(df, "l_partkey")
        .orderBy("i").collect().map(_.getLong(1))
    val za = zs(li.filter(col("l_orderkey") % 2 === 0))
    val zb = zs(li.filter(col("l_orderkey") % 2 =!= 0))
    assert(za.zip(zb).map { case (x, y) => x + y }.toSeq ==
      full.map(_.getLong(1)).toSeq)
  }
}
