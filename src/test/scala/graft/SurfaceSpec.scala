package graft

import graft.catalog.SchemaEvolution
import graft.functions.FixedString
import graft.model.GraphStore
import graft.operators.Kv
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class FixedStringSpec extends SparkSpec {
  import spark.implicits._

  test("truncates, pads, preserves exact width — through codegen") {
    val df = Seq("abcdefghijklmnop", "abc", "12345678", null)
      .toDF("s")
    val out = df.select(FixedString.fixedString(col("s"), 8, "_").as("f"))
      .as[String].collect().toSeq
    assert(out == Seq("abcdefgh", "abc_____", "12345678", null))
  }

  test("interpreted eval path agrees with codegen") {
    val e = FixedString(
      org.apache.spark.sql.catalyst.expressions.Literal("xy"), 4, "*")
    assert(e.eval(null).toString == "xy**")
  }
}

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("old rows get the default expression, new rows keep stored value") {
    val df = Seq((1L, 1, "stored", 10), (2L, 2, "stored", 20))
      .toDF("id", SchemaEvolution.VersionCol, "v", "base")
    val out = SchemaEvolution.applyDefaults(df, Seq(
      SchemaEvolution.EvolvedField("v", 2,
        concat(lit("dflt_"), col("base")))))
    val got = out.select("id", "v").as[(Long, String)].collect().toMap
    assert(got(1L) == "dflt_10") // v1 row: default expr sees the row
    assert(got(2L) == "stored")
  }
}

class KvSpec extends SparkSpec {
  import spark.implicits._

  test("put overwrites, get fetches subset, remove deletes") {
    val space = Seq((1L, "a"), (2L, "b")).toDF("key", "value")
    val put = Kv.put(space, Seq((2L, "B"), (3L, "c")).toDF("key", "value"))
    assert(put.count() == 3)
    assert(put.filter($"key" === 2L).select("value").as[String].head() == "B")
    val got = Kv.get(put, Seq(1L, 3L, 99L).toDF("key"))
    assert(got.count() == 2)
    val removed = Kv.remove(put, Seq(1L).toDF("key"))
    assert(removed.select("key").as[Long].collect().toSet == Set(2L, 3L))
  }
}

class AnalyticsSpec extends SparkSpec {
  import graft.analytics.GraphAnalytics

  lazy val store: GraphStore = GraphStore.cached(spark, sfDir)

  test("degrees agree with direct counts") {
    val deg = GraphAnalytics.degrees(store, Seq("placed"))
    val orders = GraphStore.table(spark, sfDir, "orders")
    val expect = orders.groupBy(col("o_custkey")).count()
    val joined = deg.join(expect,
      deg("_vid") === expect("o_custkey"))
    assert(joined.filter(col("out_deg") =!= col("count")).count() == 0)
  }

  test("scc: cycles fuse, chains and one-way links stay separate") {
    import spark.implicits._
    // 1→2→3→1 (cycle), 3→4 (one-way), 5→6 and 6→5 (2-cycle), 4→5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (5L, 6L), (6L, 5L), (4L, 5L)).toDF("s", "d")
    val got = GraphAnalytics
      .stronglyConnectedComponents(edges, "s", "d", maxPeels = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,  // the 3-cycle
      4L -> 4L,                                       // bridge vertex
      5L -> 5L, 6L -> 5L),                            // the 2-cycle
      s"unexpected SCC labels: $got")
    // undirected CC would fuse EVERYTHING into one component — the
    // distinction SCC exists for
    val cc = org.apache.spark.graphx.Graph.fromEdges(
      edges.rdd.map(r =>
        org.apache.spark.graphx.Edge(r.getLong(0), r.getLong(1), 0)),
      0L).connectedComponents().vertices.values.distinct().count()
    assert(cc == 1L)
  }

  test("connected components labels = min vid per component") {
    // synthetic graph with known components: {1,2,3} and {5,6}.
    // (On the TPC-H graph tag id-spaces overlap — same-id = same vertex,
    // which is reference-faithful: a Nebula vertex can hold many tags.)
    import spark.implicits._
    val edges = Seq((1L, 2L, 0L), (2L, 3L, 0L), (5L, 6L, 0L))
      .toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 5L, 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val cc = GraphAnalytics.connectedComponents(tiny, Seq("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("componentStats: vertex and arc counts per component") {
    import spark.implicits._
    // components {1,2,3} (2 arcs) and {5,6} (1 arc)
    val edges = Seq((1L, 2L, 0L), (2L, 3L, 0L), (5L, 6L, 0L))
      .toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 5L, 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.componentStats(tiny, Seq("e"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    CacheScope.drain(spark)
    assert(got == Map(1L -> ((3L, 2L)), 5L -> ((2L, 1L))), s"got $got")
  }

  test("commonNeighbors: per-edge support, zero-support edges survive") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 3-4: each triangle edge has
    // exactly one common neighbor, the pendant edge has none
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.commonNeighbors(tiny, Seq("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (2L, 3L) -> 1L, (3L, 4L) -> 0L), s"got $got")
    CacheScope.drain(spark)
  }

  test("personalizedPageRank: mass decays from seeds, unreachable = 0") {
    import spark.implicits._
    // chain 1 -> 2 -> 3 seeded at 1; disconnected edge 5 -> 6
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 5L, 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val pr = GraphAnalytics.personalizedPageRank(tiny, Seq("e"),
        seeds = Seq(1L), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheScope.drain(spark)
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L) && pr(3L) > 0.0, s"got $pr")
    assert(pr(5L) == 0.0 && pr(6L) == 0.0, s"got $pr")
  }

  test("linkPredict: triangle + pendant feature triple") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: every triangle edge has one
    // common neighbor; degrees 2/2/3/1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.linkPredict(tiny, Seq("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    CacheScope.drain(spark)
    assert(got == Map(
      (1L, 2L) -> ((1L, 3L, 4L)),   // common 3; deg 2+2-1; 2*2
      (1L, 3L) -> ((1L, 4L, 6L)),   // common 2; deg 2+3-1; 2*3
      (2L, 3L) -> ((1L, 4L, 6L)),
      (3L, 4L) -> ((0L, 4L, 3L))),  // no common; deg 3+1-0; 3*1
      s"got $got")
  }

  test("assortativityStats: hand-computed sums on triangle + pendant") {
    import spark.implicits._
    // degrees 2/2/3/1; 8 arcs, Σx=18, Σx²=44, Σxy=38
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val r = GraphAnalytics.assortativityStats(tiny, Seq("e")).head()
    CacheScope.drain(spark)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((8L, 18L, 44L, 38L)), s"got $r")
  }

  test("clusteringCoef: exact integer (triangle, wedge) pairs") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.clusteringCoef(tiny, Seq("e"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    CacheScope.drain(spark)
    assert(got == Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 1L)),  // in the triangle, deg 2
      3L -> ((1L, 3L)),                    // deg 3: one closed wedge of 3
      4L -> ((0L, 0L))), s"got $got")      // pendant: no wedges
  }

  test("hits: fan-out hub and shared authority dominate, L1-normalized") {
    import spark.implicits._
    // 1 -> {2,3,4} (fan-out hub) and 5 -> 2 (2 = strongest authority)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L, 5L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.hits(tiny, Seq("e"), iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    CacheScope.drain(spark)
    val auth = got.view.mapValues(_._1).toMap
    val hub = got.view.mapValues(_._2).toMap
    assert(auth(2L) > auth(3L) && auth(3L) == auth(4L) &&
      auth(1L) == 0.0 && auth(5L) == 0.0, s"auth $auth")
    assert(hub(1L) > hub(5L) && hub(5L) > 0.0 &&
      hub(2L) == 0.0 && hub(3L) == 0.0, s"hub $hub")
    // L1 normalization: each score vector sums to ~1 (quantized 1e-6)
    assert(math.abs(auth.values.sum - 1.0) < 1e-4, s"auth $auth")
    assert(math.abs(hub.values.sum - 1.0) < 1e-4, s"hub $hub")
  }

  test("kCore: pendant peels away, triangle survives, fixpoint stable") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: k=2 peels vertex 4 in round 1,
    // then the triangle is stable (all degrees exactly 2)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    def core(rounds: Int) = GraphAnalytics.kCore(tiny, Seq("e"), k = 2,
        rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = core(2); CacheScope.drain(spark)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
    // converged: more rounds change nothing
    val more = core(5); CacheScope.drain(spark)
    assert(more == got)
  }

  test("kTruss: pendant edge peels, triangle edges survive with support") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: k=3 requires support >= 1, so
    // the pendant edge (support 0) peels in round 1; the triangle is
    // stable with every edge at support 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    def truss(rounds: Int) = GraphAnalytics.kTruss(tiny, Seq("e"), k = 3,
        rounds = rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = truss(1); CacheScope.drain(spark)
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      s"got $got")
    // fixpoint: more rounds change nothing
    val more = truss(3); CacheScope.drain(spark)
    assert(more == got)
  }

  test("lubyMIS: independence, maximality, partition invariance") {
    import spark.implicits._
    // path 1-2-3-4-5 plus pendant 6 on 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    def check(tiny: GraphStore): Unit = {
      val st = GraphAnalytics.lubyMIS(tiny, Seq("e"), rounds = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(st.size == 6)
      val mis = st.filter(_._2 == 1).keySet
      // independence: no two MIS vertices adjacent
      for (a <- mis; b <- mis if a != b) assert(!und((a, b)))
      // maximality after enough rounds: nothing undecided, and every
      // covered vertex has a MIS neighbor
      assert(!st.values.exists(_ == 0))
      st.filter(_._2 == 2).keys.foreach { v =>
        assert(mis.exists(m => und((v, m))), s"covered $v has no MIS nbr")
      }
    }
    val tiny = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    check(tiny)
    val tiny13 = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges.repartition(13)), edgeTypeIds = Map("e" -> 1))
    check(tiny13) // hash priorities: identical at any partitioning
    CacheScope.drain(spark)
  }

  test("priorityColoring: proper, complete at budget, invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    def run(tiny: GraphStore): Map[Long, Int] =
      GraphAnalytics.priorityColoring(tiny, Seq("e"), rounds = 6)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val tiny = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val c = run(tiny)
    assert(c.size == 6)
    // 6 rounds always finish 6 vertices (min-priority vertex wins
    // every round), and adjacent vertices never share a color
    assert(!c.values.exists(_ == -1))
    for (a <- c.keys; b <- c.keys if a != b && und((a, b)))
      assert(c(a) != c(b), s"adjacent $a,$b share color ${c(a)}")
    val tiny17 = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges.repartition(17)),
      edgeTypeIds = Map("e" -> 1))
    assert(run(tiny17) == c) // fixed md5 priorities: layout-free
    CacheScope.drain(spark)
  }

  test("maximalMatching: valid, maximal at budget, invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L)).toSet
    def run(tiny: GraphStore): Set[(Long, Long, Int)] =
      GraphAnalytics.maximalMatching(tiny, Seq("e"), rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    val tiny = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val m = run(tiny)
    // every matched pair is a real edge; no vertex matched twice
    m.foreach { case (v, mate, _) => assert(und((v, mate))) }
    val touched = m.toSeq.flatMap { case (v, mate, _) => Seq(v, mate) }
    assert(touched.distinct.size == touched.size)
    // maximality after the budget: every edge has a matched endpoint
    val ts = touched.toSet
    und.foreach { case (a, b) =>
      assert(ts(a) || ts(b), s"edge $a-$b fully unmatched") }
    val tiny11 = GraphStore(
      vertices = Map("n" -> (1L to 6L).toDF("_vid")),
      edges = Map("e" -> edges.repartition(11)),
      edgeTypeIds = Map("e" -> 1))
    assert(run(tiny11) == m) // fixed md5 priorities: layout-free
    CacheScope.drain(spark)
  }

  test("independentCascade: theta bounds = BFS / seeds-only") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> (1L to 5L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    def run(theta: Int): Map[Long, Int] =
      GraphAnalytics.independentCascade(tiny, Seq("e"), Seq(1L),
          thetaPermille = theta, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // theta=1000: every coin lands -> cascade IS the BFS level map
    assert(run(1000) == Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2, 4L -> 3))
    // theta=0: nothing propagates
    assert(run(0) == Map(1L -> 0))
    // a mid theta is a subset of BFS respecting monotone rounds
    val mid = run(500)
    assert(mid.contains(1L) && mid.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
    CacheScope.drain(spark)
  }

  test("linkPredAuc: two-clique signal scores above chance, invariant") {
    import spark.implicits._
    // two K6 cliques joined by one bridge: held-out intra-clique
    // edges have rich common neighbors; rewired negatives are mostly
    // cross-clique non-edges with zero CN -> AUC well above 1/2
    val cliqueEdges = (for {
      base <- Seq(0L, 10L); i <- 1L to 6L; j <- (i + 1) to 6L
    } yield (base + i, base + j)) :+ ((6L, 11L))
    val edges = cliqueEdges.map { case (s, d) => (s, d, 0L) }
      .toDF("_src", "_dst", "_rank")
    def run(e: org.apache.spark.sql.DataFrame) = {
      val tiny = GraphStore(
        vertices = Map("n" -> ((1L to 6L) ++ (11L to 16L)).toDF("_vid")),
        edges = Map("e" -> e), edgeTypeIds = Map("e" -> 1))
      GraphAnalytics.linkPredAuc(tiny, Seq("e"), testMod = 3,
          maxDegree = 16)
        .as[(Long, Long, Long, Long, Long)].head()
    }
    val r = run(edges)
    val (p, n, conc, ties, auc) = r
    assert(p > 0 && n > 0)
    assert(conc + ties <= p * n)
    assert(auc == (2 * conc + ties) * 1000000L / (2 * p * n))
    assert(auc > 500000L, s"expected signal above chance, got $auc")
    assert(run(edges.repartition(13)) == r) // md5 split: layout-free
    CacheScope.drain(spark)
  }

  test("neighborDegreeCurve: star graph spectrum") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> (0L to 3L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.neighborDegreeCurve(tiny, Seq("e"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .toMap
    // leaves (deg 1) all see the hub (deg 3); the hub sees leaves
    assert(got == Map(3000000L -> ((1L, 3L)), 1000000L -> ((3L, 1L))))
    CacheScope.drain(spark)
  }

  test("node2vecWalks: replays the exact biased draw (scala oracle)") {
    import spark.implicits._
    // two triangles sharing vertex 3, plus chord 1-4: mixed
    // return/near/far weights exercised at every step
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (1L, 4L)).map { case (s, d) => (s, d, 0L) }
      .toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(vertices = Map("n" -> (1L to 5L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val got = GraphAnalytics.node2vecWalks(tiny, Seq("e"), Seq(1L, 2L),
      nWalks = 2, steps = 4, maxDeg = 8, wReturn = 1, wNear = 4, wFar = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val adj: Map[Long, IndexedSeq[Long]] = Seq((1L, 2L), (2L, 3L),
      (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L), (1L, 4L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ps) =>
        v -> ps.map(_._2).distinct.sorted.toIndexedSeq }
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    for (seed <- Seq(1L, 2L); w <- 0 until 2) {
      val wid = seed * 2 + w
      var cur = seed
      assert(got((wid, 0)) == cur)
      val n1 = adj(cur)
      var prev = cur
      cur = n1((h(s"$wid#1#$cur") % n1.size).toInt)
      assert(got((wid, 1)) == cur, s"walk $wid step 1")
      for (s <- 2 to 4) {
        val pn = adj(prev).toSet
        val pool = adj(cur).flatMap(x =>
          Seq.fill(if (x == prev) 1 else if (pn(x)) 4 else 2)(x))
        val nxt = pool((h(s"$wid#$s#$prev#$cur") % pool.size).toInt)
        assert(got((wid, s)) == nxt, s"walk $wid step $s")
        prev = cur; cur = nxt
      }
    }
    CacheScope.drain(spark)
  }

  test("randomWalks: deterministic, edge-respecting, isolated seeds halt") {
    import spark.implicits._
    // triangle 1-2-3; vertex 9 is isolated (no adjacency row)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 9L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    def run() = GraphAnalytics
      .randomWalks(tiny, Seq("e"), Seq(1L, 9L), nWalks = 2, steps = 4,
        maxDeg = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w1 = run(); CacheScope.drain(spark)
    val w2 = run(); CacheScope.drain(spark)
    assert(w1 == w2) // hash-seeded: bit-identical across runs
    // isolated seed 9 (walk_ids 18, 19): exactly the step-0 row each
    assert(w1.filter(_._1 >= 18L) ==
      Set((18L, 0, 9L), (19L, 0, 9L)))
    // triangle walks never halt: 2 walks x steps 0..4
    assert(w1.count(_._1 < 18L) == 10)
    // every consecutive (vid, next) pair is a triangle edge
    val und = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val byWalk = w1.filter(_._1 < 18L).groupBy(_._1)
    byWalk.values.foreach { rows =>
      rows.toSeq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(und((a, b)), s"non-edge hop $a->$b")
        case _         =>
      }
    }
  }

  test("kHop returns min distance, expands each vertex once") {
    import spark.implicits._
    // 1 -> 2 -> 3 -> 4, plus shortcut 1 -> 3 and a back-edge 3 -> 1:
    // min-dist must win (3 at dist 1, not 2) and the cycle must not
    // re-emit visited vertices.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (3L, 1L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val out = GraphAnalytics.kHop(tiny, Seq("e"), Seq(1L), maxHops = 3)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(out == Seq(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("pagerank: sinks rank above sources, mass is finite") {
    val pr = GraphAnalytics.pageRank(store, Seq("in_region"), iters = 5)
    // regions (sinks with many in-edges) must outrank nations (sources)
    val regionIds = store.tag("region").select("_vid")
      .collect().map(_.getLong(0)).toSet
    val rows = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val regionAvg = rows.filter(kv => regionIds(kv._1)).values.sum /
      regionIds.size
    val otherAvg = rows.filterNot(kv => regionIds(kv._1)).values.sum /
      (rows.size - regionIds.size)
    assert(regionAvg > otherAvg)
  }

  test("graphShape: loops, dupes, and isolated vertices hand-counted") {
    import spark.implicits._
    val arcs = Seq((1L, 2L), (1L, 2L), (2L, 2L), (3L, 1L))
      .toDF("s", "d")
    val verts = Seq(1L, 2L, 3L, 99L).toDF("vid") // 99 isolated
    val r = graft.operators.Audit.graphShape(arcs, "s", "d", verts, "vid")
      .collect().head
    assert(r.getAs[Long]("n_arcs_raw") == 4L)
    assert(r.getAs[Long]("n_self_loops") == 1L)
    assert(r.getAs[Long]("n_parallel_dupes") == 1L)
    assert(r.getAs[Long]("n_distinct_arcs") == 3L)
    assert(r.getAs[Long]("n_endpoints") == 3L)
    assert(r.getAs[Long]("n_isolated") == 1L)
  }

  test("boundedEccentricity: per-seed radii on a directed path") {
    import spark.implicits._
    // directed path 1->2->3->4: ecc within 3 hops differs per seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val out = GraphAnalytics.boundedEccentricity(tiny, Seq("e"),
        seeds = Seq(1L, 3L, 4L), maxHops = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, 4L))) // reaches 2,3,4
    assert(out(3L) == ((1L, 2L))) // reaches 4 only
    assert(out(4L) == ((0L, 1L))) // sink: itself
  }

  test("modularityStats: two triangles + one bridge, hand-counted") {
    import spark.implicits._
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L)))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> (Seq(1L, 2L, 3L, 11L, 12L, 13L)).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val comms = Seq((1L, 100L), (2L, 100L), (3L, 100L),
      (11L, 200L), (12L, 200L), (13L, 200L)).toDF("vid", "comm")
    val out = GraphAnalytics.modularityStats(tiny, Seq("e"), comms,
        "vid", "comm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // each triangle: 3 intra edges; bridge 3-11 splits degrees 1/1
    assert(out(100L) == ((3L, 3L, 7L, 7L)))
    assert(out(200L) == ((3L, 3L, 7L, 7L)))
  }

  test("neighborhoodDegreeAgg: path graph rings computed exactly") {
    import spark.implicits._
    // path 1-2-3-4: degs 1,2,2,1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val out = GraphAnalytics.neighborhoodDegreeAgg(tiny, Seq("e"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((1L, 2L, 1L, 2L))) // nbr {2}; ring2 {3}
    assert(out(2L) == ((2L, 3L, 1L, 1L))) // nbrs {1,3}; ring2 {4}
    assert(out(3L) == ((2L, 3L, 1L, 1L)))
    assert(out(4L) == ((1L, 2L, 1L, 2L)))
  }

  test("skewReport: exact counts, permille, deterministic top-k") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = graft.operators.Skew.skewReport(df, "k", k = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("hot", 6L, 600L, 10L), ("warm", 3L, 300L, 10L)))
  }

  test("weightedPageRank: uniform weights reduce to plain pagerank; " +
      "weight skew moves rank mass") {
    import spark.implicits._
    // star: 1 -> {2, 3}. Uniform weights == plain pagerank exactly
    // (w/W == 1/deg); skewing w(1,2) must rank 2 above 3.
    val uni = Seq((1L, 2L, 1.0), (1L, 3L, 1.0)).toDF("s", "d", "w")
    val pr = GraphAnalytics.weightedPageRank(uni, iters = 3)
      .as[(Long, Double)].collect().toMap
    val edges = Seq((1L, 2L, 0L), (1L, 3L, 0L)).toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val plain = GraphAnalytics.pageRank(tiny, Seq("e"), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr == plain)
    val skew = Seq((1L, 2L, 3.0), (1L, 3L, 1.0)).toDF("s", "d", "w")
      .transform(GraphAnalytics.weightedPageRank(_, iters = 3))
      .as[(Long, Double)].collect().toMap
    assert(skew(2L) > skew(3L))
    assert(skew(2L) > pr(2L)) // 2's share grew with its weight
  }

  test("labelPropagation: triangle converges, pair oscillates — both deterministic") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (8L, 9L))
      .map { case (s, d) => (s, d, 0L) }.toDF("_src", "_dst", "_rank")
    val tiny = GraphStore(
      vertices = Map("n" -> Seq(1L, 2L, 3L, 8L, 9L).toDF("_vid")),
      edges = Map("e" -> edges), edgeTypeIds = Map("e" -> 1))
    val out = GraphAnalytics.labelPropagation(tiny, Seq("e"), iters = 2)
      .as[(Long, Long)].collect().toMap
    // triangle: round 1 -> (2,1,1), round 2 -> all 1 (min-label ties)
    // pair 8-9: swap, swap back — sync LPA's classic bipartite cycle
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 9L))
    CacheScope.drain(spark)
  }

  test("shortestPaths relaxes through the cheaper multi-hop route") {
    import spark.implicits._
    // 1->2 direct costs 5; 1->3->2 costs 2; 2->4 extends the cheap path
    val edges = Seq((1L, 2L, 5.0), (1L, 3L, 1.0), (3L, 2L, 1.0),
      (2L, 4L, 1.0)).toDF("s", "d", "w")
    val out = GraphAnalytics.shortestPaths(edges, Seq(1L), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.0, 2L -> 2.0, 3L -> 1.0, 4L -> 3.0))
    CacheScope.drain(spark)
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivf topk finds the exact neighbor when cells align") {
    val emb = GraphStore.table(spark, sfDir, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Seq(20L), k = 10).select("cand_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
      Seq(20L), k = 10, nCells = 8, nProbe = 8)
      .select("cand_id").as[Long].collect().toSet
    // nProbe = nCells probes everything -> recall must be 1
    assert(approx == exact)
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding",
      Seq(20L), k = 10, nCells = 8, nProbe = 2)
      .select("cand_id").as[Long].collect().toSet
    assert(partial.nonEmpty && partial.subsetOf(
      (0L until 1000L).toSet))
  }
}

class DotProductSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.VectorOps.dotp

  // the interpreted HOF formulation DotProduct replaces — the oracle here
  private def hofDot(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("dot_product matches the zip_with/aggregate fold on float arrays") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f),
        Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "a", "b")
    val out = df.select(dotp(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-exact
  }

  test("dot_product double arrays, null array, length mismatch") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // 32.0
      (Seq(1.0), Seq(1.0, 2.0)),                   // length mismatch -> null
      (null, Seq(1.0))).toDF("a", "b")             // null array -> null
    val out = df.select(dotp(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("dot_product survives interpreted (non-codegen) eval") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.select(dotp(col("a"), col("b"))).head.getDouble(0) == 11.0)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", prev)
    }
  }
}

class WinnowingSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.pipeline.TextAnalysis

  test("winnowing guarantee: shared run >= k+w-1 chars shares a fingerprint") {
    val common = "zqxjkwvbnmplfgh" // 15 chars > k+w-1 = 11
    val df = Seq(
      (1L, s"aaaa $common bbbb"),
      (2L, s"cccc dddd $common eeee")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", 8, 4)
      .select("id", "fp_hash").as[(Long, Long)].collect().toSet
    val shared = fps.collect { case (1L, h) => h }
      .intersect(fps.collect { case (2L, h) => h })
    assert(shared.nonEmpty) // at least one fingerprint from the common run
  }

  test("winnowing: short docs yield no fingerprints, positions valid") {
    val df = Seq((1L, "tiny"), (2L, "exactly11ch")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", 8, 4)
      .select("id", "fp_pos").as[(Long, Long)].collect()
    assert(!fps.exists(_._1 == 1L))        // 4 chars < k: nothing
    val doc2 = fps.filter(_._1 == 2L)      // 11 = k+w-1: exactly one window
    assert(doc2.length == 1 && doc2.head._2 >= 1 && doc2.head._2 <= 4)
  }
}

class IvfTrainSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("k-means training reduces mean assignment distance, partitions corpus") {
    // three tight clusters around orthogonal axes (ids 0..2 = one seed
    // per cluster, so init centroids are single members, not means)
    val rnd = new scala.util.Random(3)
    def near(axis: Int): Array[Float] =
      Array.tabulate(4)(j => (if (j == axis) 1f else 0f) +
        (rnd.nextFloat() - 0.5f) * 0.2f)
    val rows = (0 until 30).map(i => (i.toLong, near(i % 3)))
    val emb = rows.toDF("vec_id", "embedding")
    val trained = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells = 3, iters = 3)
      .select("cell", "n", "cvec")
      .as[(Long, Long, Seq[Double])].collect()
    assert(trained.map(_._2).sum == 30)      // every vector assigned once
    assert(trained.length == 3)
    // each trained centroid points dominantly along its cluster axis
    trained.foreach { case (cell, n, cvec) =>
      assert(n > 0)
      val axis = cvec.indexOf(cvec.max)
      assert(cvec(axis) > 0.8, s"cell $cell centroid $cvec")
    }
  }

  test("empty cells keep their previous centroid") {
    // identical corpus + identical seeds: the lowest-cell tie-break
    // starves cell 1 every iteration, so the coalesce fallback must keep
    // its initial centroid and report n = 0
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val trained = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells = 2, iters = 2)
      .select("cell", "n", "cvec").as[(Long, Long, Seq[Double])]
      .collect().sortBy(_._1)
    assert(trained(0)._2 == 3)                       // all on cell 0
    assert(trained(1)._2 == 0)                       // cell 1 starved
    assert(trained(1)._3 == Seq(1.0, 0.0))           // kept init centroid
  }
}

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.pipeline.Dedup

  test("incoming near-dup of the stored index is flagged with best match") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val existing = Seq((1L, base), (2L, "totally different words here " +
      "nothing shared with anything else at all okay")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),                                  // exact dup of 1
      (11L, "unrelated fresh content that matches nothing in the corpus " +
        "because every token is new")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(existing, "doc_id", "text", 4, 8)
    val out = Dedup.dedupAgainstIndex(sigs, incoming, "doc_id", "text",
      n = 4, numHashes = 8, bands = 4, minAgree = 0.5)
      .as[(Long, Long, Double)].collect().toList
    assert(out == List((10L, 1L, 1.0)))  // 10 flagged vs 1; 11 clean
  }
}
