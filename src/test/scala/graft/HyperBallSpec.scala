package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-10 wave-6 operators: HyperBall distance sketches, big-star CC,
  * PPMI, the white-box Bloom index, and perceptual image hashing. */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def pathEdges: DataFrame =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")

  test("hyperBall register count equals exact ball register count on a path") {
    // out-balls on a 5-path after 2 rounds: ball(1)={1,2,3}, ball(4)={4,5}
    val est = graft.analytics.GraphAnalytics.hyperBall(pathEdges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def regsOf(ids: Seq[Long]): Long =
      graft.operators.Stats.hllRegisters(ids.toDF("x"), "x", b = 8).count()
    assert(est(1L) == regsOf(Seq(1L, 2L, 3L)))
    assert(est(3L) == regsOf(Seq(3L, 4L, 5L)))
    assert(est(4L) == regsOf(Seq(4L, 5L)))
    assert(est(5L) == regsOf(Seq(5L)))
  }

  test("hyperBall is partition-count invariant") {
    val e = pathEdges.unionByName(Seq((5L, 1L), (2L, 5L)).toDF("s", "d"))
    def run(p: Int) = graft.analytics.GraphAnalytics
      .hyperBall(e.repartition(p), rounds = 3)
      .orderBy("v").collect().toSeq
    assert(run(1) == run(7))
  }

  test("neighborhoodFunction is monotone and flags exactly one radius") {
    val nf = graft.analytics.GraphAnalytics
      .neighborhoodFunction(pathEdges, rounds = 3)
      .orderBy("t").collect()
    val vals = nf.map(_.getLong(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
      s"N(t) must be non-decreasing: ${vals.toSeq}")
    assert(nf.map(_.getLong(2)).sum == 1L, "exactly one effective radius")
    // the flagged t is the smallest with nf*10 >= 9*last
    val last = vals.last
    val expectEff = nf.find(_.getLong(1) * 10 >= 9 * last).get.getLong(0)
    assert(nf.find(_.getLong(2) == 1L).get.getLong(0) == expectEff)
  }

  test("ccBigStar matches fixpoint min-label propagation") {
    // two components: {1..5} ring + chain, {10,11,12}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (10L, 11L), (11L, 12L)).toDF("a", "b")
    val got = graft.analytics.GraphAnalytics.ccBigStar(e, rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent oracle: hash-min propagation to fixpoint
    val adj = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (10L, 11L), (11L, 12L)).flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      for (v <- adj.keys) {
        val m = (adj(v).map(lbl) :+ lbl(v)).min
        if (m < lbl(v)) { lbl = lbl.updated(v, m); changed = true }
      }
    }
    assert(got == lbl)
  }

  test("ccBigStar agrees with the recursive oracle edge law at sf0.001") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e = li.select((col("l_orderkey") % 50 + 1000L).as("a"),
      (col("l_suppkey") + 2000L).as("b"))
    val cc = graft.analytics.GraphAnalytics.ccBigStar(e, rounds = 12)
    // component labels must be consistent across every original edge
    val bad = e.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v")).distinct()
      .join(cc.withColumnRenamed("_vid", "u")
        .withColumnRenamed("component", "cu"), "u")
      .join(cc.withColumnRenamed("_vid", "v")
        .withColumnRenamed("component", "cv"), "v")
      .filter(col("cu") =!= col("cv"))
    assert(bad.count() == 0, "edge endpoints in different components")
    // and every label must be a member of its own component (root law)
    val roots = cc.select(col("component")).distinct()
      .join(cc.select(col("_vid").as("component")).distinct(),
        Seq("component"), "left_anti")
    assert(roots.count() == 0, "component label not a vertex of the graph")
  }

  test("ppmi matches the hand formula on a tiny corpus") {
    val docs = Seq("a b a b", "a c").toDF("text")
    val got = graft.pipeline.TextAnalysis.ppmi(docs, "text",
      window = 1, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // pairs (w,c) within +-1: "a b a b" -> ab,ba,ab,ba(3 each dir? enumerate)
    // positions a,b,a,b: (a,b)x3? a1-b2, b2-a1/b2-a3, a3-b2/a3-b4, b4-a3
    // counts: (a,b)=3, (b,a)=3 ; "a c": (a,c)=1, (c,a)=1 ; N=8
    // marginals: w_cnt a=4, b=3, c=1 ; c_cnt b=3, a=4, c=1
    def pmi(cnt: Long, wc: Long, cc: Long): Double =
      math.log((cnt.toDouble * 8.0) / (wc.toDouble * cc.toDouble))
    // (a,b): ln(3*8/(4*3)) = ln 2 > 0 ; (b,a): ln(3*8/(3*4)) = ln 2
    // (a,c): ln(1*8/(4*1)) = ln 2 ; (c,a): ln(1*8/(1*4)) = ln 2
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
    assert(got(("a", "b")) == ((3L, pmi(3, 4, 3))))
    assert(got(("c", "a")) == ((1L, pmi(1, 1, 4))))
  }

  test("bloom index admits every member (no false negatives) and merges") {
    val data = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_suppkey") % 4).as("bkt"), col("l_partkey").as("key"))
    val idx = graft.operators.BloomIndex.build(data, "bkt", "key",
      bits = 256, hashes = 2)
    val stats = graft.operators.BloomIndex.probe(idx,
      data.distinct(), data, "bkt", "key", bits = 256, hashes = 2)
      .agg(sum("missed"), sum("n_probes"), sum("true_hits")).head()
    assert(stats.getLong(0) == 0L, "a member was rejected")
    assert(stats.getLong(1) == stats.getLong(2), "every probe is a member")
    // merge law: building over the union == bit_or of shard indexes
    val shardA = data.filter(col("key") % 2 === 0)
    val shardB = data.filter(col("key") % 2 =!= 0)
    val merged = graft.operators.BloomIndex
      .build(shardA, "bkt", "key", 256, 2)
      .unionByName(graft.operators.BloomIndex.build(shardB, "bkt", "key",
        256, 2))
      .groupBy("bucket", "word_idx").agg(expr("bit_or(word)").as("word"))
    assert(merged.exceptAll(idx).isEmpty && idx.exceptAll(merged).isEmpty)
  }

  test("dHash reads the spec gradient back out of the real codec") {
    import graft.pipeline.Multimodal
    val ids = Seq(10L, 778L, 33L).toDF("doc_id") // 10 and 778 share
    // (w,h,offset): dims from id%24 / 7id%24, offset 31·768 ≡ 0 (mod 256)
    val dh = Multimodal.dHash(Multimodal.synthesize(ids, "doc_id")).toDF()
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(dh(10L) == dh(778L), "ids 768 apart encode identical rasters")
    // direct recomputation from the pixel spec for id 10
    val (w, h) = (Multimodal.specWidth(10), Multimodal.specHeight(10))
    var hi = 0L; var lo = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val y = j * h / 8
      val p0 = Multimodal.specPixel(10, i * w / 9, y)
      val p1 = Multimodal.specPixel(10, (i + 1) * w / 9, y)
      if (p1 > p0) {
        val k = j * 8 + i
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
    }
    assert(dh(10L) == ((hi, lo)))
  }

  test("dhashNearDup finds the exact-duplicate pair at hamming 0") {
    import graft.pipeline.Multimodal
    val ids = Seq(10L, 778L, 33L, 57L).toDF("doc_id")
    val pairs = Multimodal.dhashNearDup(
      Multimodal.dHash(Multimodal.synthesize(ids, "doc_id")).toDF(),
      maxHamming = 0, maxBlockSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((10L, 778L, 0L)))
  }
}
