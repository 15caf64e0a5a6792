package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Round-11 additions: iterated BPE training. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain replays the reference greedy-merge loop exactly") {
    // corpus: 'aaab' ×2, 'ab' ×1 — small enough to run by hand.
    // step 1: (a a)=4 beats (a b)=3 → 'aaab'→'aa a b'
    // step 2: (a b)=3 beats (aa a)=2 → 'aa ab' / 'ab'
    // step 3: (aa ab)=2 → 'aaab'; then no pairs remain (early stop)
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a a", 4L), (2L, "a b", 3L), (3L, "aa ab", 2L)),
      s"merge list diverged: $got")
  }

  test("bpeTrain leftmost-greedy merge handles overlapping runs") {
    // 'aaa': pairs (a,a) at 2 positions -> cnt 2; greedy merge gives
    // 'aa a' (NOT 'a aa'), so step 2's top pair is (aa, a)
    val docs = Seq("aaa aaa").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a a", 4L), (2L, "aa a", 2L)),
      s"greedy law diverged: $got")
  }

  test("louvainMoveWeighted at w=1 reduces to the unweighted move") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e = li.select((col("l_orderkey") % 40).as("a"),
      (col("l_suppkey") % 40 + 100).as("b"))
    val verts = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v"))).distinct()
    val comm = verts.select(col("v"), (col("v") % 7).as("c"))
    val want = graft.analytics.GraphAnalytics.louvainMove(e, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val g = e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct().withColumn("w", lit(1L))
    val got = graft.analytics.GraphAnalytics.louvainMoveWeighted(g, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "weighted move with unit weights diverged")
  }

  test("contractGraphWeighted preserves total edge weight (2m invariant)") {
    val g = Seq((1L, 2L, 3L), (2L, 3L, 2L), (3L, 3L, 5L), (4L, 5L, 1L))
      .toDF("u", "v", "w")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L))
      .toDF("x", "c")
    val c = graft.analytics.GraphAnalytics.contractGraphWeighted(g, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c == Set((1L, 1L, 3L), (1L, 3L, 2L), (3L, 3L, 5L),
      (4L, 4L, 1L)), s"unexpected contraction: $c")
    // total weight preserved: 3+2+5+1 == 3+2+5+1
    assert(c.toSeq.map(_._3).sum == 11L)
  }

  test("louvainLevels: multilevel ascent on a resolution-limit ring") {
    // 60 K5 cliques in a ring — inside the resolution limit, so
    // merging adjacent cliques raises Q and the loop must emit >1 level
    val n = 300
    val intra = (0 until n).flatMap { v =>
      val h = v - v % 5
      (h until h + 5).filter(_ != v).map(b => (v.toLong, b.toLong))
    }
    val ring = (0 until n by 5).map(h =>
      (h.toLong, ((h + 5) % n).toLong))
    val e = (intra ++ ring).toDF("a", "b")
    val out = graft.analytics.GraphAnalytics
      .louvainLevels(e, maxLevels = 3, roundsPerLevel = 4)
      .transform(graft.CacheScope.persist(_))
    val levels = out.select("level", "q_num").distinct()
      .orderBy("level").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(levels.length >= 2, s"expected a multilevel ascent: ${levels.toSeq}")
    assert(levels.map(_._2).sliding(2).forall(p => p(1) > p(0)),
      s"Q must strictly improve across emitted levels: ${levels.toSeq}")
    // every level covers all original vertices
    val perLevel = out.groupBy("level").count().collect()
    assert(perLevel.forall(_.getLong(1) == n.toLong))
    // level l+1 COARSENS level l: each level-1 community maps into
    // exactly one level-2 community
    val l1 = out.filter(col("level") === 1)
      .select(col("_vid"), col("community").as("c1"))
    val l2 = out.filter(col("level") === 2)
      .select(col("_vid"), col("community").as("c2"))
    val split = l1.join(l2, "_vid").groupBy("c1")
      .agg(countDistinct(col("c2")).as("n2"))
      .filter(col("n2") > 1).count()
    assert(split == 0L, "levels must nest (contraction coarsens)")
    graft.CacheScope.unpersist(out)
  }

  test("knnRefine improves recall on clustered embeddings") {
    import graft.pipeline.Similarity
    // 8 tight clusters along the axes + deterministic noise big enough
    // to split each cluster across LSH buckets (single-table LSH then
    // MISSES intra-cluster edges; the NN-descent 2-hop round recovers
    // them — the gate's random embeddings have no such structure to
    // recover, so the improvement law lives here)
    val n = 96
    val dim = 8
    val vecs = (0 until n).map { i =>
      val c = i % 8
      (i.toLong, (0 until dim).map(j =>
        ((if (j == c) 7.0 else 0.0) +
          ((i * 7 + j * 13) % 11 - 5).toDouble).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
      .transform(graft.CacheScope.persist(_))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryIds = (0L until n.toLong), k = 3)
      .select(col("query_id"), col("cand_id"))
      .transform(graft.CacheScope.persist(_))
    def hits(g: org.apache.spark.sql.DataFrame, q: String,
        c: String): Long =
      exact.join(g.select(col(q).as("query_id"), col(c).as("cand_id")),
        Seq("query_id", "cand_id"), "left_semi").count()
    val g0 = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      numPlanes = 6, dim = dim, maxBucketSize = 64)
    val g1 = Similarity.knnRefine(emb, "vec_id", "embedding", k = 3,
      numPlanes = 6, dim = dim, maxBucketSize = 64, expandCap = 6)
    val (h0, h1) = (hits(g0, "vec_id", "nbr_id"),
      hits(g1, "vec_id", "nbr_id"))
    assert(h1 > h0, s"NN-descent round must recover edges: $h0 -> $h1")
    // the refined graph never exceeds k edges per vertex
    val overK = g1.groupBy("vec_id").count().filter(col("count") > 3)
      .count()
    assert(overK == 0L)
    // refinement never DROPS below any existing edge quality: per
    // vertex, the refined top-1 sim >= the unrefined top-1 sim
    val t0 = g0.filter(col("rk") === 1)
      .select(col("vec_id"), col("sim").as("s0"))
    val t1 = g1.filter(col("rk") === 1)
      .select(col("vec_id"), col("sim").as("s1"))
    val worse = t0.join(t1, "vec_id").filter(col("s1") < col("s0")).count()
    assert(worse == 0L, "re-rank can only improve the per-vertex top-1")
  }

  test("bpeEncodeCounts applies the trained vocab (hand-replayed)") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // after 1 merge (a a): 'aaab' = [aa, a, b] (3 syms), 'ab' = [a, b]
    // (2) -> 3 words, 3+3+2 = 8 subwords
    val e1 = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e1.toSeq == Seq((1L, 3L, 8L)), s"got: ${e1.toSeq}")
    // after 3 merges everything is a single symbol -> 3 subwords
    val e3 = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e3.toSeq == Seq((1L, 3L, 3L)), s"got: ${e3.toSeq}")
  }

  test("weightedMatching prefers the heavy edge (1/2-approx greedy)") {
    import graft.analytics.GraphAnalytics
    // path 1-2-3-4 with the middle edge heaviest: greedy picks (2,3)
    // and kills both side edges — total weight 9 vs the
    // max-CARDINALITY matching's 10, the textbook 1/2-approx trade
    val pairs = Seq((1L, 2L, 5L), (2L, 3L, 9L), (3L, 4L, 5L))
      .toDF("a", "b", "w")
    val got = GraphAnalytics.weightedMatching(pairs, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 3L)), s"expected the heavy edge: $got")
    // under-budget throws (inherits the convergence guard)
    val long = (0 until 20).map(i => (i.toLong, i + 1L, 1L))
      .toDF("a", "b", "w")
    intercept[IllegalStateException] {
      GraphAnalytics.weightedMatching(long, rounds = 1).collect()
    }
  }

  test("knnDescent converges to a fixpoint and beats one round") {
    import graft.pipeline.Similarity
    val n = 96
    val dim = 8
    val vecs = (0 until n).map { i =>
      val c = i % 8
      (i.toLong, (0 until dim).map(j =>
        ((if (j == c) 7.0 else 0.0) +
          ((i * 7 + j * 13) % 11 - 5).toDouble).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
      .transform(graft.CacheScope.persist(_))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryIds = (0L until n.toLong), k = 3)
      .select(col("query_id"), col("cand_id"))
      .transform(graft.CacheScope.persist(_))
    def hits(g: org.apache.spark.sql.DataFrame): Long =
      exact.join(g.select(col("vec_id").as("query_id"),
        col("nbr_id").as("cand_id")),
        Seq("query_id", "cand_id"), "left_semi").count()
    def descend(r: Int) = Similarity.knnDescent(emb, "vec_id",
      "embedding", k = 3, numPlanes = 6, dim = dim, maxBucketSize = 64,
      expandCap = 6, maxRounds = r)
    val h1 = hits(descend(1))
    val h3 = hits(descend(3))
    assert(h3 >= h1, s"more descent rounds must not lose recall: $h1 -> $h3")
    assert(h3 > 0L)
    // fixpoint is absorbing: a generous budget early-exits to the
    // same graph a larger budget reaches
    val g8 = descend(8).collect().map(_.toSeq).toSet
    val g12 = descend(12).collect().map(_.toSeq).toSet
    assert(g8 == g12, "early exit must land on the fixpoint graph")
  }

  test("sccCondensation: quotient is a DAG with bundled arcs") {
    import graft.analytics.GraphAnalytics
    // two chained 3-cycles + a parallel arc between them + a tail
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L), (6L, 7L)).toDF("s", "d")
    val q = GraphAnalytics.sccCondensation(edges, "s", "d", maxPeels = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // SCCs: {1,2,3} -> 1, {4,5,6} -> 4, {7} -> 7; arcs 3->4 and 2->4
    // bundle; intra-SCC arcs fold into self-loop rows
    assert(q == Map((1L, 4L) -> 2L, (4L, 7L) -> 1L,
      (1L, 1L) -> 3L, (4L, 4L) -> 3L), s"unexpected quotient: $q")
    // acyclic across distinct components: trim to empty
    var dag = q.keySet.filter(p => p._1 != p._2)
    var ok = true
    while (dag.nonEmpty && ok) {
      val srcs = dag.map(_._1); val dsts = dag.map(_._2)
      val removable = dag.filter(p =>
        !dsts.contains(p._1) || !srcs.contains(p._2))
      if (removable.isEmpty) ok = false else dag --= removable
    }
    assert(ok, "condensation must be acyclic")
  }

  test("quantileNormalize: identity on itself, shift maps to shift") {
    import graft.operators.Stats
    val vals = (0 until 300).map(i => ((i * 37) % 900).toLong)
      .toDF("v")
    // self-normalization is the identity on every populated bin
    val selfMap = Stats.quantileNormalize(vals, vals, "v",
      lo = 0L, width = 100L, nBins = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(3))
    assert(selfMap.nonEmpty && selfMap.forall(p => p._1 == p._2),
      s"self-map must be identity: ${selfMap.toSeq}")
    // a +200 reference shift maps every bin up by exactly 2
    val shifted = vals.select((col("v") + 200L).as("v"))
    val m = Stats.quantileNormalize(vals, shifted, "v",
      lo = 0L, width = 100L, nBins = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(3))
    assert(m.forall(p => p._2 == p._1 + 2),
      s"+200 shift must map bins +2: ${m.toSeq}")
  }

  test("multi-probe LSH dominates single-probe (candidate superset)") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def tops(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("query_id").agg(sum("sim").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val single = tops(Similarity.lshTopK(emb, "vec_id", "embedding",
      queryIds = (0L to 4L), k = 5, numPlanes = 6, dim = 64))
    val multi = tops(Similarity.lshMultiProbeTopK(emb, "vec_id",
      "embedding", queryIds = (0L to 4L), k = 5, numPlanes = 6,
      dim = 64))
    // flip 0 is among the probes, so multiprobe candidates are a
    // SUPERSET: per query it returns at least as many results and at
    // least as good a top-k sim mass
    for ((q, (ss, sn)) <- single) {
      val (ms, mn) = multi(q)
      assert(mn >= sn, s"query $q lost candidates: $sn -> $mn")
      assert(ms >= ss - 1e-9 || mn > sn,
        s"query $q sim mass dropped: $ss -> $ms")
    }
  }

  test("ivfAppend assigns every batch vector to a trained cell") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.ivfTrain(emb.filter(col("vec_id") < 60),
        "vec_id", "embedding", nCells = 8, iters = 2)
      .transform(graft.CacheScope.persist(_))
    val batch = emb.filter(col("vec_id") >= 60)
    val out = Similarity.ivfAppend(cents, batch, "vec_id", "embedding")
      .transform(graft.CacheScope.persist(_))
    assert(out.count() == batch.count(), "every batch vector assigned")
    assert(out.select("vec_id").distinct().count() == batch.count(),
      "exactly one cell per vector")
    val cells = cents.select("cell").collect().map(_.getLong(0)).toSet
    assert(out.select("cell").distinct().collect()
      .forall(r => cells.contains(r.getLong(0))),
      "assignments land only in trained cells")
    // partition-count invariant (determinism)
    val out2 = Similarity.ivfAppend(cents, batch.repartition(7),
      "vec_id", "embedding").collect().map(_.toSeq).toSet
    assert(out2 == out.collect().map(_.toSeq).toSet)
  }

  test("bpeTrain merge list is prefix-stable as nMerges grows") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(40).select("text")
    val m3 = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val m6 = TextAnalysis.bpeTrain(docs, "text", nMerges = 6)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(m6.take(3) == m3, "steps 1..3 must not depend on nMerges")
    assert(m6.size == 6)
  }
}
