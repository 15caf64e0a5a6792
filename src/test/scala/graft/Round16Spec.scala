package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Round-16 additions: the block-id-layout MoG fixture, trained
  * (Lloyd) coarse-layer certification for flat IVF and the two-layer
  * graph walk, the salted hot-bucket law in knnGraph, and the
  * production-path (LSH + NN-descent substrate) clustered recall. */
class Round16Spec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // This suite's fixtures are the largest in the test run (the
  // production-path test walks 4096 vectors through descent +
  // training + beam) and it executes AFTER ~60 other suites in the
  // single shared test JVM — without per-test drains the accumulated
  // persisted/broadcast debris OOMs the 8g heap (observed in the r16
  // close run). Same valve shape as Bench's heap carry-over guard.
  override def afterEach(): Unit = {
    CacheScope.drain(spark)
    val rt = Runtime.getRuntime
    if (rt.totalMemory - rt.freeMemory > rt.maxMemory / 2) System.gc()
  }

  private def mog(n: Int, block: Boolean): DataFrame =
    Similarity.mogEmbeddings(spark, n = n, dim = 16, nClusters = 8,
      block = block)

  private def meanMin(rec: DataFrame): (Double, Double) = {
    val r = rec.agg(avg(col("recall")), min(col("recall"))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("mogEmbeddings block layout: same point law, only the cluster " +
      "key changes — ids whose interleaved and block cluster keys " +
      "agree get identical vectors") {
    // cluster(interleaved) = id % 8; cluster(block, n=512) = id div 64.
    // id = 65: 65 % 8 = 1 and 65 div 64 = 1 -> identical embedding.
    // id = 1:   1 % 8 = 1 but  1 div 64 = 0 -> different embedding.
    val inter = mog(512, block = false).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val blk = mog(512, block = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(blk(65L) == inter(65L), "matching cluster keys must agree")
    assert(blk(1L) != inter(1L), "differing cluster keys must differ")
  }

  test("ivfTopKWith on the untrained seed frame reproduces ivfTopK " +
      "exactly (the serving-path refactor law)") {
    val emb = mog(256, block = false)
      .transform(CacheScope.persist(_))
    val seeds = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("cvec"))
    val qids = (0L to 7L)
    val a = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryIds = qids, k = 5, nCells = 16, nProbe = 4)
      .orderBy("query_id", "cand_id").collect()
    val b = Similarity.ivfTopKWith(emb, "vec_id", "embedding", seeds,
      queryIds = qids, k = 5, nProbe = 4)
      .orderBy("query_id", "cand_id").collect()
    assert(a.length == b.length && a.sameElements(b),
      s"ivfTopKWith diverged from ivfTopK: ${a.length} vs ${b.length}")
  }

  test("block layout: two-layer untrained entries crater, trained " +
      "query-aware entries recover (the r16 certification relations)") {
    val m = mog(512, block = true).transform(CacheScope.persist(_))
    val qids: Seq[Long] = (0 until 16).map(_ * 32L)
    val gt = Similarity.bruteForceTopK(m, "vec_id", "embedding",
      queryIds = qids, k = 5).transform(CacheScope.persist(_))
    val knn = Similarity.exactKnnEdges(m, "vec_id", "embedding", k = 8)
      .transform(CacheScope.persist(_))
    val (muU, _) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.graphAnnIvfTopK(m, "vec_id", "embedding", knn,
        queryIds = qids, nCells = 32, nProbe = 6,
        beam = 12, rounds = 6, k = 5)))
    val cents = Similarity.ivfTrain(m, "vec_id", "embedding",
      nCells = 32, iters = 3)
    val (muT, mnT) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.graphAnnIvfTopKWith(m, "vec_id", "embedding", knn,
        queryIds = qids, centroids = cents,
        nProbe = 6, beam = 12, rounds = 6, k = 5)))
    assert(muU <= 0.2, s"untrained two-layer should crater, got $muU")
    assert(muT >= 0.9 && mnT >= 0.9,
      s"trained two-layer must recover: mean=$muT min=$mnT")
    // flat IVF is layout-robust even untrained (assignment adapts);
    // trained must not regress it
    val (muFU, _) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.ivfTopK(m, "vec_id", "embedding", queryIds = qids,
        k = 5, nCells = 32, nProbe = 6)))
    val (muFT, _) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.ivfTopKWith(m, "vec_id", "embedding", cents,
        queryIds = qids, k = 5, nProbe = 6)))
    assert(muFU >= 0.9, s"flat untrained layout-robustness: $muFU")
    assert(muFT >= muFU, s"trained flat regressed: $muFT < $muFU")
  }

  test("knnGraph salted hot-bucket law: no vector loses all its LSH " +
      "edges on a corpus whose buckets exceed the cap, and sub-" +
      "bucketing is a no-op on an under-cap corpus") {
    val m = mog(1024, block = true).transform(CacheScope.persist(_))
    // clusters of 128 vs cap 32: every cluster-bucket is over-cap —
    // the old law dropped them all (zero LSH edges)
    val g = Similarity.knnGraph(m, "vec_id", "embedding", k = 4,
      numPlanes = 6, dim = 16, maxBucketSize = 32)
    val covered = g.select("vec_id").distinct().count()
    assert(covered >= 1000L,
      s"salting must keep hot-bucket members paired, covered=$covered")
    // under-cap corpus: nSub = 1 everywhere -> identical to the old law
    val small = mog(64, block = false).transform(CacheScope.persist(_))
    val gs = Similarity.knnGraph(small, "vec_id", "embedding", k = 4,
      numPlanes = 6, dim = 16, maxBucketSize = 128)
    assert(gs.count() > 0L)
  }

  test("kmeansParTrain at k = true cluster count: the k-means|| " +
      "draft covers every cluster and lifts the worst query where " +
      "degenerate-init Lloyd leaves a cluster split") {
    val m = mog(512, block = true).transform(CacheScope.persist(_))
    val qids: Seq[Long] = (0 until 16).map(_ * 32L)
    val gt = Similarity.bruteForceTopK(m, "vec_id", "embedding",
      queryIds = qids, k = 5).transform(CacheScope.persist(_))
    val cFirst = Similarity.ivfTrain(m, "vec_id", "embedding",
      nCells = 8, iters = 4)
    val (muF, mnF) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.ivfTopKWith(m, "vec_id", "embedding", cFirst,
        queryIds = qids, k = 5, nProbe = 2)))
    val cPar = Similarity.kmeansParTrain(m, "vec_id", "embedding",
      nCells = 8, ell = 4, rounds = 3, iters = 4)
    val (muP, mnP) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.ivfTopKWith(m, "vec_id", "embedding", cPar,
        queryIds = qids, k = 5, nProbe = 2)))
    assert(mnF < 0.9, s"expected the degenerate init to hurt some " +
      s"query (min=$mnF) — fixture no longer exercises the law")
    assert(muP >= 0.99 && mnP >= 0.99,
      s"kmeans|| + Lloyd must recover: mean=$muP min=$mnP")
    assert(muP >= muF, s"composed init regressed: $muP < $muF")
    // the draft must refuse loudly when it can't seed k cells
    val tiny = mog(512, block = true).filter(col("vec_id") < 4)
    intercept[IllegalArgumentException] {
      Similarity.kmeansParTrain(tiny, "vec_id", "embedding",
        nCells = 8, ell = 1, rounds = 1, iters = 1)
    }
  }

  test("production two-layer path on clustered data: descent-3 " +
      "substrate + trained query-aware entries reach the gate bar") {
    val m = mog(4096, block = true).transform(CacheScope.persist(_))
    val qids: Seq[Long] = (0 until 16).map(_ * 256L)
    val gt = Similarity.bruteForceTopK(m, "vec_id", "embedding",
      queryIds = qids, k = 5)
    val sub = Similarity.knnDescent(m, "vec_id", "embedding", k = 16,
      numPlanes = 6, dim = 16, maxBucketSize = 128, expandCap = 16,
      maxRounds = 3).select("vec_id", "nbr_id")
    val cents = Similarity.ivfTrain(m, "vec_id", "embedding",
      nCells = 32, iters = 3)
    val (mu, mn) = meanMin(Similarity.recallPerQuery(gt,
      Similarity.graphAnnIvfTopKWith(m, "vec_id", "embedding", sub,
        queryIds = qids, centroids = cents,
        nProbe = 6, beam = 12, rounds = 7, k = 5)))
    assert(mu >= 0.9, s"production-path clustered recall: $mu")
    assert(mn >= 0.5, s"worst query: $mn")
  }
}
