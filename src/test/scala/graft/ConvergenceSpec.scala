package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics

/** r11 convergence guards (VERDICT r10 "What's wrong #1"): the
  * fixed-round label family must FAIL LOUDLY when under-budgeted
  * instead of silently returning pre-convergence (= wrong) labels,
  * and must early-exit at the fixpoint when over-budgeted. */
class ConvergenceSpec extends SparkSpec {
  import spark.implicits._

  private def path(n: Int) =
    (0 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")

  test("ccBigStar throws loudly when the round budget is too small") {
    val ex = intercept[IllegalStateException] {
      GraphAnalytics.ccBigStar(path(64), rounds = 1).collect()
    }
    assert(ex.getMessage.contains("no fixpoint"))
  }

  test("ccBigStar early-exits at the fixpoint under a generous budget") {
    // a 64-vertex path converges in O(log n) alternating rounds; a
    // budget of 50 must not run 50 rounds (the trace shows the exit)
    val trace = GraphAnalytics.ccBigStarTrace(path(64), maxRounds = 50)
      .orderBy("round").collect()
    assert(trace.length < 50, "no early exit")
    assert(trace.last.getLong(1) == 0L, "final round must confirm fixpoint")
    assert(trace.init.forall(_.getLong(1) > 0L),
      "only the final round may read 0 (fixpoint is absorbing)")
    // and the converged labels are correct: one component rooted at 0
    val lbl = GraphAnalytics.ccBigStar(path(64), rounds = 50)
      .select("component").distinct().collect()
    assert(lbl.map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("ccBigStarTrace does NOT throw on a non-converged run") {
    val trace = GraphAnalytics.ccBigStarTrace(path(64), maxRounds = 1)
      .collect()
    assert(trace.length == 1 && trace.head.getLong(1) > 0L,
      "an under-budgeted trace must surface the non-zero changed count")
  }

  test("scc throws loudly when maxPeels is too small") {
    // two SCCs in a chain: the first peel retires only the min-rooted
    // cycle; resolving the second needs peel 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("s", "d")
    val ex = intercept[IllegalStateException] {
      GraphAnalytics.stronglyConnectedComponents(edges, "s", "d",
        maxPeels = 1).collect()
    }
    assert(ex.getMessage.contains("unresolved"))
    // with budget it resolves both
    val got = GraphAnalytics.stronglyConnectedComponents(edges, "s", "d",
      maxPeels = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"unexpected labels: $got")
  }

  test("kCore/coreness throw loudly when the peel budget is too small") {
    // a path peels ONE layer per round under k=2: budget 1 on a long
    // path must throw instead of returning a superset of the 2-core
    val pathEdges = path(12)
    val store = graft.model.GraphStore(
      Map.empty,
      Map("p" -> pathEdges.select(
        col("a").as(graft.model.GraphStore.SRC),
        col("b").as(graft.model.GraphStore.DST),
        lit(0L).as(graft.model.GraphStore.RANK))),
      Map("p" -> 1))
    val ex = intercept[IllegalStateException] {
      GraphAnalytics.kCore(store, Seq("p"), k = 2, rounds = 1).collect()
    }
    assert(ex.getMessage.contains("not converged"))
    // with budget: a path has NO 2-core at all
    assert(GraphAnalytics.kCore(store, Seq("p"), k = 2, rounds = 12)
      .count() == 0L)
    val ex2 = intercept[IllegalStateException] {
      GraphAnalytics.coreness(pathEdges, maxK = 2, roundsPerK = 1)
        .collect()
    }
    assert(ex2.getMessage.contains("not converged"))
    // converged: every path vertex has coreness 1
    val cv = GraphAnalytics.coreness(pathEdges, maxK = 2, roundsPerK = 12)
      .select("coreness").distinct().collect().map(_.getLong(0)).toSeq
    assert(cv == Seq(1L))
  }

  test("scc trims a pure DAG to all-singleton SCCs in one peel") {
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = GraphAnalytics.stronglyConnectedComponents(dag, "s", "d",
      maxPeels = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(v => v -> v).toMap)
  }

  test("scc peeling agrees with GraphX SCC on a dense modded fixture") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_linenumber") === 1)
      .select((col("l_orderkey") % 60).as("s"), (col("l_partkey") % 60).as("d"))
    val got = GraphAnalytics.stronglyConnectedComponents(li, "s", "d",
      maxPeels = 30).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.graphx.{Edge, Graph}
    val g = Graph.fromEdges(
      li.filter(col("s") =!= col("d"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 0)), 0L)
    val want = g.stronglyConnectedComponents(40)
      .vertices.collect().toMap
    assert(got == want, "peeling SCC diverges from GraphX SCC")
  }
}
