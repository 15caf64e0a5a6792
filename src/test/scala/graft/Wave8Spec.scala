package graft

import org.apache.spark.sql.functions._

/** Round-10 wave-8 operators: TextRank, graph contraction, audio
  * features, image patch tiling. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("textRank ranks the co-occurrence hub first") {
    val docs = Seq("hub alpha", "hub beta", "hub gamma", "hub delta",
      "alpha beta").toDF("text")
    val top = graft.pipeline.TextAnalysis.textRank(docs, "text",
      window = 1, minCount = 1, iters = 5, topK = 3)
      .collect().map(_.getString(0))
    assert(top.head == "hub", s"expected hub first, got ${top.toSeq}")
  }

  test("contractGraph collapses communities into the weighted super-graph") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("x", "c")
    val got = graft.analytics.GraphAnalytics.contractGraph(e, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 1L) -> 3L, (1L, 4L) -> 1L, (4L, 4L) -> 3L))
  }

  test("audioFeatures reads the PCM spec back out of the WAV codec") {
    import graft.pipeline.Multimodal
    val id = 2L // id % 3 == 2 -> wav
    val out = Multimodal.audioFeatures(
      Multimodal.synthesize(Seq(id).toDF("doc_id"), "doc_id"))
      .collect().head
    val nf = Multimodal.specFrames(id)
    val samples = (0 until nf).map(i => Multimodal.specPixel(id, i, 0))
    val zc = samples.sliding(2).count {
      case Seq(a, b) => (a >= 128) != (b >= 128); case _ => false }
    val en = samples.map(v => (v - 128).toLong * (v - 128)).sum
    assert(out.n_frames == nf.toLong && out.zero_cross == zc.toLong &&
      out.energy == en)
  }

  test("kAnonymityAudit flags small and homogeneous classes") {
    val df = Seq(
      ("a", 1, 10), ("a", 1, 11), ("a", 1, 12), // size 3, 3 distinct
      ("b", 2, 20), ("b", 2, 20), // size 2, 1 distinct -> l_risk
      ("c", 3, 30) // size 1 -> k_risk (and l ok at l=1? l=2 -> risk)
    ).toDF("q1", "q2", "s")
    val got = graft.pipeline.Curation.kAnonymityAudit(df,
      Seq("q1", "q2"), "s", k = 2, l = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("a") == ((3L, 3L, 0L, 0L)))
    assert(got("b") == ((2L, 1L, 0L, 1L)), "homogeneous class")
    assert(got("c") == ((1L, 1L, 1L, 1L)), "singleton class")
  }

  test("ccIncremental equals the full recompute (including untouched " +
      "singletons)") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b")
    val labels = graft.analytics.GraphAnalytics.ccBigStar(base, 12)
    // delta merges {1,2,3} with {10,11}; {20,21} untouched
    val delta = Seq((3L, 10L)).toDF("a", "b")
    val inc = graft.analytics.GraphAnalytics
      .ccIncremental(labels, delta, 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.analytics.GraphAnalytics
      .ccBigStar(base.unionByName(delta), 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc(20L) == 20L && inc(21L) == 20L, "untouched component kept")
  }

  test("coreness: triangle is 2-core, pendant is 1-core") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = graft.analytics.GraphAnalytics.coreness(e, maxK = 3,
      roundsPerK = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("poissonBootstrap: deterministic, CI brackets, exact full mean") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        col("l_quantity"))
    def run(p: Int) = graft.operators.Stats.poissonBootstrap(
      li.repartition(p), "rid", "l_quantity", reps = 8)
      .orderBy("rep").collect()
    val a = run(1)
    assert(a.toSeq == run(5).toSeq, "partition-count invariant")
    assert(a.length == 8)
    val n = li.count()
    // n_eff is Poisson(n): within 5 sigma of n
    assert(a.forall(r => math.abs(r.getLong(1) - n) < 5 * math.sqrt(n)))
    val (lo, hi) = (a.head.getDouble(3), a.head.getDouble(4))
    val means = a.map(_.getDouble(2))
    assert(lo == means.min && hi == means.max,
      "rank-1/rank-8 CI bounds over 8 replicates")
    assert(means.forall(m => m >= lo && m <= hi))
  }

  test("ivfPqResidualTopK: ranked, bounded, partition-invariant") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def run(p: Int) = graft.pipeline.Similarity.ivfPqResidualTopK(
      emb.repartition(p), "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L), k = 3, nCells = 8, nProbe = 3,
      m = 2, kCodes = 4, iters = 1, dim = 64)
      .orderBy("query_id", "rk").collect()
    val a = run(1)
    assert(a.toSeq == run(5).toSeq, "partition-count invariant")
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.values.forall(rows =>
      rows.map(_.getInt(3)).toSeq == (1 to rows.length)),
      "ranks contiguous from 1 per query")
    assert(byQ.values.forall(_.length <= 3))
    assert(a.forall(_.getDouble(2) >= 0.0), "ADC distance nonnegative")
  }

  test("conductance: two triangles with one bridge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("x", "c")
    val got = graft.analytics.GraphAnalytics.conductance(e, comm)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // vol = 2*3 intra-ends + 1 bridge-end = 7; cut = 1; 2m = 14
    // phi = 1*1000 div min(7, 7) = 142
    assert(got == Map(1L -> ((3L, 7L, 1L, 142L)),
      4L -> ((3L, 7L, 1L, 142L))))
  }

  test("landmark estimates are exact when the landmark lies on the " +
      "shortest path, and never underestimate") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val sketch = graft.analytics.GraphAnalytics.landmarkDistances(
      path, landmarks = Seq(3L), rounds = 4)
    val est = graft.analytics.GraphAnalytics.landmarkPairEstimate(
      sketch, Seq((1L, 5L), (2L, 4L), (1L, 2L)).toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(est((1L, 5L)) == 4L, "landmark on the path: exact")
    assert(est((2L, 4L)) == 2L)
    assert(est((1L, 2L)) == 3L, "upper bound via the landmark (1-3-2)")
  }

  test("featureHash: tf sums to the token count per doc") {
    val docs = Seq((1L, "a b a"), (2L, "c d")).toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.featureHash(docs, "doc_id",
      "text", b = 4)
    val sums = out.groupBy("doc_id").agg(sum("tf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums == Map(1L -> 3L, 2L -> 2L))
    assert(out.collect().forall(_.getLong(3) >= 1L))
  }

  test("silenceRuns: hand PCM islands") {
    import graft.pipeline.Multimodal
    val id = 5L // wav (5 % 3 == 2)
    val out = Multimodal.silenceRuns(
      Multimodal.synthesize(Seq(id).toDF("doc_id"), "doc_id"), eps = 16)
      .collect().head
    val nf = Multimodal.specFrames(id)
    val sil = (0 until nf).map(i =>
      math.abs(Multimodal.specPixel(id, i, 0) - 128) <= 16)
    val runs = sil.foldLeft(List.empty[Int]) {
      case (acc, true) if acc.nonEmpty && acc.head > 0 =>
        (acc.head + 1) :: acc.tail
      case (acc, true) => 1 :: acc
      case (acc, false) => 0 :: acc
    }.filter(_ > 0)
    assert(out.n_frames == nf.toLong)
    assert(out.n_silent == sil.count(identity).toLong)
    assert(out.n_runs == runs.length.toLong)
    assert(out.longest_run == (if (runs.isEmpty) 0L else runs.max.toLong))
  }

  test("snmPairs: window pairs over the sorted key order, two-level " +
      "rank == global sort") {
    val df = Seq((1L, "apple"), (2L, "apply"), (3L, "banana"),
      (4L, "band"), (5L, "cherry"), (6L, "appla")).toDF("id", "k")
    val got = graft.pipeline.Dedup.snmPairs(df, "id", "k", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // sorted: appla(6) apple(1) apply(2) banana(3) band(4) cherry(5)
    val order = Seq(6L, 1L, 2L, 3L, 4L, 5L)
    val expect = (for {
      i <- order.indices; j <- order.indices
      if j > i && j - i <= 2
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got == expect)
  }

  test("itemCosine: hand baskets") {
    // baskets: {1,2}, {1,2}, {1,3}: pair (1,2) cnt 2, (1,3) cnt 1
    val e = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("b", "i")
    val got = graft.analytics.GraphAnalytics.itemCosine(e, "b", "i",
      maxPerBasket = 8, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got((1L, 2L)) == ((2L, q(2.0 / math.sqrt(3.0 * 2.0)))))
    assert(got((1L, 3L)) == ((1L, q(1.0 / math.sqrt(3.0 * 1.0)))))
  }

  test("pageRankConvergence: residual decays monotonically on a " +
      "well-mixed graph") {
    val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") % 50).as("s"),
        (col("l_partkey") % 50).as("d"))
    val rows = graft.analytics.GraphAnalytics
      .pageRankConvergence(e, iters = 4)
      .orderBy("iter").collect()
    assert(rows.length == 4)
    val l1 = rows.map(_.getDouble(1))
    assert(l1.zip(l1.tail).forall { case (a, b) => b <= a },
      s"L1 residual must not increase: ${l1.toSeq}")
    assert(rows.forall(r => r.getDouble(2) <= r.getDouble(1) + 1e-9),
      "max delta bounded by the L1 total")
  }

  test("densestSubgraph: peel strips the sparse periphery, density " +
      "rises, best flagged once") {
    // K4,4 core (density 16/8 = 2) + 8 pendant edges off one vertex
    val core = for { a <- 1L to 4L; b <- 11L to 14L } yield (a, b)
    val pend = (1L to 8L).map(i => (1L, 100L + i))
    val rows = graft.analytics.GraphAnalytics.densestSubgraph(
      (core ++ pend).toDF("a", "b"), epsPermille = 0, rounds = 3)
      .orderBy("round").collect()
    assert(rows.map(_.getLong(4)).sum == 1L, "exactly one best round")
    val d = rows.map(_.getLong(3))
    assert(d.max > d.head, "peeling must beat the raw graph here")
    // the flagged round realizes the max density
    val best = rows.find(_.getLong(4) == 1L).get
    assert(best.getLong(3) == d.max)
  }

  test("weightedMedian: hand histogram per group") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L),
      ("b", 5L, 3L), ("b", 7L, 1L)).toDF("g", "v", "w")
    val got = graft.operators.Stats.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // a: weights 1,1,10 of 12 -> cum at v=3 reaches 12 >= 6 first at 3
    // b: cum at 5 is 3, 2*3 >= 4 -> median 5
    assert(got == Map("a" -> ((3L, 12L)), "b" -> ((5L, 4L))))
  }

  test("imagePatches tile the full raster exactly once") {
    import graft.pipeline.Multimodal
    val ids = Seq(10L, 33L, 57L).toDF("doc_id")
    val media = Multimodal.synthesize(ids, "doc_id")
    val patches = Multimodal.imagePatches(media, grid = 4).toDF()
    val perImage = patches.groupBy("id")
      .agg(count(lit(1)).as("n_patches"), sum("n_px").as("tot_px"),
        sum("px_sum").as("tot_sum"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val stats = Multimodal.pixelStats(media).collect()
      .map(p => p.id -> (p.n_px, p.px_sum)).toMap
    for ((id, (np, tpx, tsum)) <- perImage) {
      assert(np == 16L, s"id $id patch count")
      assert((tpx, tsum) == stats(id), s"id $id pixel partition")
    }
  }
}
