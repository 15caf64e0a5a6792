package graft

import graft.analytics.GraphAnalytics
import org.apache.spark.sql.functions._

class TemporalGraphSpec extends SparkSpec {
  import spark.implicits._

  // 1 -t10-> 2 -t20-> 3   (valid chain: 10 <= 20)
  // 1 -t50-> 4 -t40-> 5   (INVALID chain: arrives at 4 at t50, edge
  //                        4->5 departed at t40 — static BFS reaches 5)
  // 2 -t5->  6            (invalid from seed 1 via t10; 5 < 10)
  // 1 -t30-> 2            (later parallel edge; min arrival stays t10)
  private val edges = Seq(
    (1L, 2L, 10L), (2L, 3L, 20L), (1L, 4L, 50L), (4L, 5L, 40L),
    (2L, 6L, 5L), (1L, 2L, 30L))
    .toDF("src", "dst", "ts")

  test("earliestArrival honors the waiting constraint static BFS violates") {
    val out = GraphAnalytics.earliestArrival(edges, Seq(1L), rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out(1L) == 0L) // seed
    assert(out(2L) == 10L) // min of the two parallel edges
    assert(out(3L) == 20L) // time-respecting chain
    assert(out(4L) == 50L)
    assert(!out.contains(5L)) // 4->5 departs before arrival at 4
    assert(!out.contains(6L)) // 2->6 departs before arrival at 2
  }

  test("earliestArrival matches per-seed scope and extra rounds are stable") {
    val two = GraphAnalytics.earliestArrival(edges, Seq(1L, 4L), rounds = 3)
      .as[(Long, Long, Long)].collect()
    val bySeed = two.groupBy(_._1).view.mapValues(
      _.map(r => r._2 -> r._3).toMap).toMap
    assert(bySeed(4L) == Map(4L -> 0L, 5L -> 40L)) // seed 4 CAN reach 5
    // monotone fixpoint: more rounds never change a settled arrival
    val more = GraphAnalytics.earliestArrival(edges, Seq(1L, 4L), rounds = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(two.toSet == more)
  }

  test("shortestPathCounts: diamond sigma, parallel-edge multiplicity") {
    import graft.model.GraphStore
    // diamond 1->{2,3}->4 plus a DUPLICATE arc 1->2 (parallel edge)
    // and a back-edge 4->1 (must not re-count the visited seed)
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 1L)).toDF(GraphStore.SRC, GraphStore.DST)
      .withColumn(GraphStore.RANK, lit(0L))
    val store = GraphStore(Map.empty, Map("p" -> e), Map("p" -> 1))
    val out = GraphAnalytics.shortestPathCounts(store, Seq("p"),
        seeds = Seq(1L), maxHops = 3)
      .select("vid", "dist", "sigma")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0, 1L)))
    assert(out(2L) == ((1, 2L))) // two parallel shortest arcs
    assert(out(3L) == ((1, 1L)))
    // via 2 there are TWO paths (parallel first hop), via 3 one: σ=3
    assert(out(4L) == ((2, 3L)))
    assert(out.size == 4) // back-edge adds nothing: 1 already visited
  }

  test("snowballSample: cap binds per frontier vertex, partition-invariant") {
    import graft.model.GraphStore
    // hub 1 with 20 out-neighbors 100..119; each neighbor -> 1000+n
    val hub = (100L to 119L).map(n => (1L, n)) ++
      (100L to 119L).map(n => (n, 1000L + n))
    val e = hub.toDF(GraphStore.SRC, GraphStore.DST)
      .withColumn(GraphStore.RANK, lit(0L))
    val store = GraphStore(Map.empty, Map("g" -> e), Map("g" -> 1))
    val out = GraphAnalytics.snowballSample(store, Seq("g"),
        seeds = Seq(1L), maxHops = 2, maxDeg = 5)
      .select("vid", "dist").as[(Long, Int)].collect()
    val byDist = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDist(0) == 1 && byDist(1) == 5, s"cap must bind: $byDist")
    assert(byDist(2) == 5) // each sampled hop-1 vertex has one child
    // determinism: a different partitioning yields the identical set
    val store17 = GraphStore(Map.empty,
      Map("g" -> e.repartition(17)), Map("g" -> 1))
    val out17 = GraphAnalytics.snowballSample(store17, Seq("g"),
        seeds = Seq(1L), maxHops = 2, maxDeg = 5)
      .select("vid", "dist").as[(Long, Int)].collect()
    assert(out.toSet == out17.toSet)
  }

  test("betweennessStats: Brandes delta on diamond and path graphs") {
    import graft.model.GraphStore
    // diamond 1->{2,3}->4: σ4 = 2, δ(2) = δ(3) = 1/2·(1+0) = 0.5,
    // δ(1) = 1·(1+0.5) + 1·(1+0.5) = 3
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF(GraphStore.SRC, GraphStore.DST)
    val store = GraphStore(Map.empty, Map("p" -> e), Map("p" -> 1))
    val out = GraphAnalytics.betweennessStats(store, Seq("p"),
        seeds = Seq(1L), maxHops = 2)
      .select("vid", "dist", "sigma", "delta")
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(4L) == ((2, 2L, 0.0))) // deepest level: no successors
    assert(out(2L) == ((1, 1L, 0.5)))
    assert(out(3L) == ((1, 1L, 0.5)))
    assert(out(1L) == ((0, 1L, 3.0)))
    // path 1->2->3: δ(2) = 1, δ(1) = 2 — and a PARALLEL edge 1->2
    // doubles σ(2) but not the ratio (σ1/σ2 = 1/2 per arc, two arcs)
    val p = Seq((1L, 2L), (1L, 2L), (2L, 3L))
      .toDF(GraphStore.SRC, GraphStore.DST)
    val pstore = GraphStore(Map.empty, Map("p" -> p), Map("p" -> 1))
    val pout = GraphAnalytics.betweennessStats(pstore, Seq("p"),
        seeds = Seq(1L), maxHops = 2)
      .select("vid", "delta").as[(Long, Double)].collect().toMap
    assert(pout(3L) == 0.0)
    assert(pout(2L) == 1.0) // σ2/σ3 = 2/2 = 1
    // two parallel arcs each contribute (1/2)·(1+1) = 1 -> δ(1) = 2
    assert(pout(1L) == 2.0)
  }

  test("betweennessStats is partition-invariant (dyadic-grid law)") {
    import graft.model.GraphStore
    val r = new scala.util.Random(7)
    val e = (1 to 400).map(_ =>
      (r.nextInt(40).toLong, r.nextInt(40).toLong))
      .toDF(GraphStore.SRC, GraphStore.DST)
    val a = GraphAnalytics.betweennessStats(
      GraphStore(Map.empty, Map("p" -> e.repartition(1)), Map("p" -> 1)),
      Seq("p"), seeds = Seq(0L, 1L), maxHops = 3)
      .select("seed", "vid", "dist", "sigma", "delta")
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    val b = GraphAnalytics.betweennessStats(
      GraphStore(Map.empty, Map("p" -> e.repartition(17)), Map("p" -> 1)),
      Seq("p"), seeds = Seq(0L, 1L), maxHops = 3)
      .select("seed", "vid", "dist", "sigma", "delta")
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    assert(a == b) // bit-identical deltas under any partitioning
  }

  test("closenessStats ppm arithmetic on a path graph") {
    import graft.model.GraphStore
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .toDF(GraphStore.SRC, GraphStore.DST)
    val store = GraphStore(Map.empty, Map("p" -> e), Map("p" -> 1))
    // path 1 -> 2 -> 3 -> 4 from seed 1: dists 0,1,2,3
    val out = GraphAnalytics.closenessStats(store, Seq("p"),
      seeds = Seq(1L), maxHops = 3)
      .select("n_reached", "sum_dist", "harmonic_ppm", "closeness_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(out._1 == 4 && out._2 == 6)
    assert(out._3 == 1000000 + 500000 + 333333) // 1/1 + 1/2 + 1/3 ppm
    assert(out._4 == 3L * 1000000 / 6) // (n-1)/sum = 0.5
  }
}
