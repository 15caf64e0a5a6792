package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  quick   Brown fox jumps over the lazy dog"), // same normalized
    (3L, "a completely different sentence about spark engines"),
    (4L, "the quick brown fox jumps over the lazy cat and dog"),
    (5L, ""),
    (6L, "the quick brown fox jumps over the lazy dog") // exact copy of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per normalized content") {
    val kept = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L)) // 2 and 6 are dups of 1
  }

  test("ngram jaccard finds the near pair, not the unrelated one") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment flags the embedded doc where jaccard stays low") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8"),
      (3L, "totally unrelated content here now"))
      .toDF("doc_id", "text")
    // doc 1's three 2-gram shingles all occur in doc 2 (12 tokens ->
    // 11 shingles): containment = 3/min(3,11) = 1.0, jaccard = 3/11
    val cont = Dedup.containmentPairs(d, "doc_id", "text",
        n = 2, threshold = 0.9).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) == (1L, 2L))
    assert(r.getAs[Long]("n_shared") == 3L)
    assert((r.getAs[Long]("sz_a"), r.getAs[Long]("sz_b")) == (3L, 11L))
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric metric misses the same pair at the same cut
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text",
      n = 2, threshold = 0.9).count() == 0L)
  }

  test("fuzzyPairs: near keys matched within blocks, far keys not") {
    val d = Seq(
      (1L, "spark engine"), (2L, "spark enginx"),  // dist 1, same block
      (3L, "spark query!"),                        // dist > 2 from both
      (4L, "zebra stripe"))                        // different block
      .toDF("doc_id", "tkey")
    val out = Dedup.fuzzyPairs(d, "doc_id", "tkey",
        maxDist = 2, maxBlockSize = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("dist")))
    assert(out.toSeq == Seq((1L, 2L, 1)))
    // the cap drops over-dense blocks entirely
    assert(Dedup.fuzzyPairs(d, "doc_id", "tkey",
      maxDist = 2, maxBlockSize = 2).count() == 0L)
  }

  test("bloomDedupNew: exact new-rows output, dup fingerprints dropped") {
    val stored = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "ALPHA   beta"),  // normalized dup of stored 1
      (11L, "epsilon zeta"),  // new
      (12L, "gamma delta"),   // exact dup of stored 2
      (13L, "eta theta"))     // new
      .toDF("doc_id", "text")
    val out = Dedup.bloomDedupNew(stored, incoming, "doc_id", "text",
        expectedItems = 100L, numBits = 8000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
    CacheScope.drain(spark)
  }

  test("bloomDedupNew: empty stored side means everything is new") {
    // bloom_filter_agg over zero rows returns a null bloom — without
    // the guard both filter branches drop every row (ADVICE r5)
    val stored = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incoming = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.bloomDedupNew(stored, incoming, "doc_id", "text",
        expectedItems = 100L, numBits = 8000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
    CacheScope.drain(spark)
  }

  test("dupSpans: exactly-touching duplicate windows merge into one span") {
    // doc1's only dup windows are pos 2 ("a b c d", covers [2,5]) and
    // pos 6 ("e f g h", covers [6,9]) — the intermediate windows
    // ("b c d e", "c d e f", "d e f g") occur nowhere in doc0. The two
    // covered ranges touch exactly (6 == 2 + k) and must merge into
    // the single maximal span [2, 9] (ADVICE r5)
    val corpus = Seq(
      (0L, "a b c d z z e f g h"),
      (1L, "y a b c d e f g h"))
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4))).toList
    assert(spans == List(1L -> ((2, 9, 8))), s"got $spans")
    CacheScope.drain(spark)
  }

  test("dupSpans: first occurrence survives, later windows merge") {
    val corpus = Seq(
      (0L, "w1 w2 w3 w4 w5"),       // all windows first occurrences
      (1L, "z w1 w2 w3 w4 w5"),     // windows @2,@3 duplicate doc0's
      (2L, "w1 w2 w3 w4"),          // single window, dup of doc0 @1
      (3L, "totally novel text here with nothing repeated at all"))
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(corpus, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    // doc1: dup windows at pos 2 and 3 overlap -> one span [2, 6]
    assert(spans(1L) == ((2, 6, 5)))
    // doc2: the whole doc is an earlier-seen window -> span [1, 4]
    assert(spans(2L) == ((1, 4, 4)))
    assert(!spans.contains(0L) && !spans.contains(3L))
    CacheScope.drain(spark)
  }

  test("minhash signatures: identical shingle sets -> identical rows") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 2, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    // doc 5 is empty -> no shingles -> absent
    assert(!sigs.contains(5L))
    assert(sigs(1L) == sigs(6L)) // exact copies agree
    assert(sigs(1L) != sigs(3L))
  }

  test("lsh candidates include the exact-duplicate pair") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 2, 8)
    val cands = Dedup.lshCandidatePairs(sigs, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 6L))) // identical sigs match in every band
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: duplicates collide, near-dups closer than unrelated") {
    val sh = Dedup.simhash(docs, "doc_id", "text", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(6L))
    assert(hamming(sh(1L), sh(2L)) <= hamming(sh(1L), sh(3L)))
  }

  test("simhash near-dup banding finds exact duplicates at any budget") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      bits = 64, maxHamming = 3)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 6L))) // hamming 0 pair must always surface
    // banding is exact w.r.t. the distance bound: verify against the
    // brute-force distance matrix
    val sigs = Dedup.simhash(docs, "doc_id", "text", bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    assert(got == brute)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count ignores leading/trailing/multiple whitespace") {
    val df = Seq("  a  b c ", "", "one").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text")))
      .as[Int].collect().toSeq
    assert(counts == Seq(3, 0, 1))
  }

  test("bigramCounts: joint and history counts, cutoff after both aggs") {
    // "a b a b a": pairs (a,b) x2, (b,a) x2 -> c1(a)=2, c1(b)=2.
    // "x y": one pair below minCount=2 -> pruned from output, but the
    // pair still exists in the un-pruned frame (cutoff is post-agg).
    val df = Seq((1L, "a b a b a"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCounts(df, "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("a", "b") -> ((2L, 2L)), ("b", "a") -> ((2L, 2L))),
      s"got $got")
    CacheScope.drain(spark)
  }

  test("quality score is bounded [0,1] and penalizes empty docs") {
    val df = Seq("the of a and to in is it " * 10, "xyz").toDF("text")
    val scores = df.select(TextAnalysis.qualityColumns(col("text"))
      .find(_._1 == "quality_score").get._2).as[Double].collect()
    assert(scores.forall(s => s >= 0 && s <= 1))
    assert(scores(0) > scores(1))
  }

  test("lang id picks the marker-heavy language deterministically") {
    val df = Seq("der hund und die katze nicht",
      "the table of value", "no markers here").toDF("text")
    val langs = df.select(TextAnalysis.predictedLang(col("text")))
      .as[String].collect().toSeq
    assert(langs == Seq("de", "en", "en")) // en = tie-break default
  }

  test("bigramDocScore: per-doc LM coverage against the corpus bigrams") {
    // corpus pairs: (a,b)x3 [2 from doc1, 1 from doc2], (b,a)x2, (b,x)x1
    // -> c1(a)=3, c1(b)=3; minCount=2 prunes (b,x) from the LM.
    // doc1 "a b a b a": 4 pairs, all known: sum_c12=3+2+3+2=10, sum_c1=12
    // doc2 "a b x": 2 pairs, (b,x) unknown: sum_c12=3, sum_c1=3
    val df = Seq((1L, "a b a b a"), (2L, "a b x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramDocScore(df, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((4L, 4L, 10L, 12L)),
      2L -> ((2L, 1L, 3L, 3L))), s"got $got")
    CacheScope.drain(spark)
  }

  test("oovRate: top-K vocab, frequency then lexicographic tie-break") {
    // tfs: a=3, b=2, c=2, z=1; vocabSize=2 -> {a, b} (b beats c on tok)
    val df = Seq((1L, "a a b c"), (2L, "a b c z")).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((4L, 1L, 250L)), 2L -> ((4L, 2L, 500L))),
      s"got $got")
    CacheScope.drain(spark)
  }

  test("qualityClassifier: exact integer scores on both sides of the " +
      "boundary") {
    // "the of and to": n_tok=4 n_char=13 n_punct=0 n_stop=4 ->
    //   score = 3*4 + 2*1000 - 4*0 = 2012 -> label 1
    // ".,!?;:": one 6-char all-punct token ->
    //   score = 3*1 + 0 - 4*1000 = -3997 -> label 0
    val df = Seq((1L, "the of and to"), (2L, ".,!?;:")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifier(df, "doc_id", "text",
        threshold = 300L)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("score"), r.getAs[Long]("label")))).toMap
    assert(got == Map(1L -> ((2012L, 1L)), 2L -> ((-3997L, 0L))), s"got $got")
  }

  test("collocations: bound pairs outscore frequent-word chance pairs") {
    // "x y" always co-occur (true collocation); "a" is everywhere, so
    // "a a" has high joint count but low PMI.
    val df = Seq.tabulate(10)(i => (i.toLong, "a a a x y a a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, "text", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // N = 70 tokens: a=50, x=10, y=10
    val (c12xy, c1x, c2y, pmiXY) = out(("x", "y"))
    assert((c12xy, c1x, c2y) == ((10L, 10L, 10L)))
    // exact integer law: ((10*10^6 div 10) * 70) div 10
    assert(pmiXY == ((10L * 1000000L / 10L) * 70L) / 10L)
    val pmiAA = out(("a", "a"))._4
    assert(pmiXY > pmiAA, s"PMI must rank x-y over a-a: $pmiXY vs $pmiAA")
    // cutoff: every surviving pair has c12 >= 5
    assert(out.values.forall(_._1 >= 5L))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")

  test("embeddingAudit: dim cohorts, zero vectors, NaN/Inf flags") {
    val bad = Seq(
      (10L, Array(0.0f, 0.0f, 0.0f), 0),          // zero vector
      (11L, Array(1.0f, Float.NaN, 0.0f), 0),     // NaN component
      (12L, Array(Float.PositiveInfinity, 0f, 0f), 0), // Inf
      (13L, Array(1.0f, 2.0f), 0))                // dim drift
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingAudit(vecs.unionByName(bad),
        "embedding")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out == Map(3L -> ((7L, 1L, 2L)), 2L -> ((1L, 0L, 0L))))
    CacheScope.drain(spark)
  }

  test("cosine: orthogonal = 0, near-parallel close to 1") {
    val sims = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(0L), k = 3)
    val top = sims.orderBy(col("rk")).collect()
    assert(top.head.getAs[Long]("cand_id") == 1L)
    assert(top.head.getAs[Double]("sim") > 0.99)
    assert(math.abs(top.last.getAs[Double]("sim")) < 1e-9)
  }

  test("lsh topk returns the bucket-local neighbor first") {
    val res = Similarity.lshTopK(vecs, "vec_id", "embedding",
      Seq(0L), k = 2, numPlanes = 2, dim = 3)
    val first = res.orderBy(col("sim").desc).collect()
    // recall is approximate; the parallel vector must be present when
    // bucketed together under any plane set that keeps them adjacent
    assert(res.count() <= 2)
  }

  test("knnGraph: bounded degree, no self edges, deterministic") {
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding",
      k = 2, numPlanes = 2, dim = 3, maxBucketSize = 10)
    val rows = g.collect()
    assert(rows.forall(r =>
      r.getAs[Long]("vec_id") != r.getAs[Long]("nbr_id")))
    val perId = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(perId.values.forall(_.length <= 2))
    // rank is dense 1..deg per vector and sims descend with it
    perId.values.foreach { es =>
      val sorted = es.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length).toSeq)
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // fixed planes (seeded) => bit-stable output across runs
    val again = Similarity.knnGraph(vecs, "vec_id", "embedding",
      k = 2, numPlanes = 2, dim = 3, maxBucketSize = 10).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("knnGraph: over-dense buckets are salted into sub-buckets, " +
      "not dropped (r16 law); under-cap behavior unchanged") {
    // all four vectors share the all-positive orthant direction =>
    // one bucket of 4 under any plane set. The pre-r16 law dropped
    // the bucket at cap 3 (zero edges — on clustered corpora where
    // bucket ≈ cluster this erased EVERY intra-cluster edge, the
    // q_mog_refine_recall 0.125 crater); the salted law splits it
    // into ceil(4/3) = 2 md5 sub-buckets, so edges still emit and
    // no pair crosses a sub-bucket boundary.
    val tight = Seq(
      (0L, Array(1.0f, 0.9f, 1.1f)),
      (1L, Array(1.1f, 1.0f, 0.9f)),
      (2L, Array(0.9f, 1.1f, 1.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val salted = Similarity.knnGraph(tight, "vec_id", "embedding",
      k = 2, numPlanes = 2, dim = 3, maxBucketSize = 3)
    assert(salted.count() > 0L,
      "hot-bucket members must keep intra-sub-bucket edges")
    // sub-bucket membership replays the engine's md5('s:'id) % 2 law
    def sub(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2
    }
    salted.collect().foreach { r =>
      assert(sub(r.getLong(0)) == sub(r.getLong(1)),
        s"edge ${r.getLong(0)}-${r.getLong(1)} crosses sub-buckets")
    }
    // at cap >= bucket size nSub = 1: identical to the old law
    assert(Similarity.knnGraph(tight, "vec_id", "embedding",
      k = 2, numPlanes = 2, dim = 3, maxBucketSize = 4).count() > 0L)
  }

  test("ivfPqTopK with nProbe = nCells equals whole-corpus ADC") {
    // probing every cell removes the IVF pruning, so the composed
    // ranking must coincide with pqAdcTopK under the same codebooks
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 1, k = 2, iters = 1, dim = 3)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding",
      cb, m = 1, dim = 3)
    val adc = Similarity.pqAdcTopK(codes, cb,
        vecs.filter(col("vec_id").isin(0L, 2L)), "vec_id", "embedding",
        m = 1, dim = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val composed = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        queryIds = Seq(0L, 2L), k = 3, nCells = 2, nProbe = 2,
        m = 1, kCodes = 2, iters = 1, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(composed == adc && composed.nonEmpty)
  }

  test("ivfPqTopK candidates come only from probed cells") {
    // nProbe 1 of 2 cells: every ranked candidate's coarse cell must be
    // the query's single probed cell
    val out = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
      queryIds = Seq(0L, 2L), k = 3, nCells = 2, nProbe = 1,
      m = 1, kCodes = 2, iters = 1, dim = 3)
    val full = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
      queryIds = Seq(0L, 2L), k = 3, nCells = 2, nProbe = 2,
      m = 1, kCodes = 2, iters = 1, dim = 3)
    // pruning can only shrink the candidate set
    assert(out.count() <= full.count() && out.count() > 0)
  }

  test("matryoshkaRecall: full-width prefix is a perfect retriever") {
    val r = Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
      queryIds = Seq(0L, 2L), k = 2, prefixDim = 3, dim = 3).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Double]("recall") == 1.0))
    // an all-zero prefix (axis vector sliced before its axis) has no
    // cosine: the op fails LOUDLY under ANSI division, not quietly
    intercept[org.apache.spark.SparkThrowable] {
      Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
        queryIds = Seq(0L, 2L), k = 2, prefixDim = 1, dim = 3).collect()
    }
  }

  test("randomProject: linear, deterministic, matches hand dot product") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 2.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f, 0.0f))) // = row0 + row1: projection is linear
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProject(e, "vec_id", "embedding",
        outDim = 2, dim = 3, seed = 7L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("p0"), r.getAs[Double]("p1")))).toMap
    val planes = Similarity.hyperplanes(2, 3, 7L)
    val scale = 1.0 / math.sqrt(2.0)
    def expect(v: Array[Double], j: Int): Double =
      graft.functions.Portable.quant(
        v.zip(planes(j)).map { case (a, b) => a * b }.sum * scale, 6)
    assert(out(0L) == ((expect(Array(1, 0, 0), 0), expect(Array(1, 0, 0), 1))))
    assert(out(1L) == ((expect(Array(0, 2, 0), 0), expect(Array(0, 2, 0), 1))))
    // linearity within quantization noise
    assert(math.abs(out(2L)._1 - (out(0L)._1 + out(1L)._1)) < 1e-5)
  }

  test("groupCentroidStats: pair-free cohesion matches hand algebra") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0), // orthogonal pair -> mean dot 0
      (2L, Array(2.0f, 0.0f), 1)) // singleton -> mean dot defined 0
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.groupCentroidStats(e, "embedding", "label")
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("s2"),
          r.getAs[Double]("snorm"), r.getAs[Double]("mean_pair_dot"))))
      .toMap
    assert(out(0) == ((2L, 2.0, 2.0, 0.0))) // ||(1,1)||²=2, Σ||v||²=2
    assert(out(1) == ((1L, 4.0, 4.0, 0.0)))
  }

  test("blocked near-dup only compares within a block") {
    val pairs = Similarity.blockedNearDupPairs(vecs, "vec_id", "embedding",
      "label", threshold = -1.0) // accept all, check candidate set
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (2L, 3L)))
  }

  test("semDedup: first occurrence survives, near-dup cluster-mates drop") {
    // centroids = vec_id < 2: cell 0 ~ x-axis, cell 1 ~ y-axis.
    // vec 2 duplicates vec 0's direction (same cell, cosine 1) -> drops;
    // vec 3 lands in cell 0 but nearly orthogonal to 0 -> survives;
    // vec 4 duplicates vec 1 in cell 1 -> drops.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(1.0f, 0.9f)),
      (4L, Array(0.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCells = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet == Set(0L, 1L, 3L), s"got $kept")
    assert(kept(0L) == 0L && kept(3L) == 0L && kept(1L) == 1L)
    CacheScope.drain(spark)
  }

  test("semanticDecontaminate: cell-blocked cross-set pairs only") {
    // centroids: cell 0 ~ x-axis, cell 1 ~ y-axis. Bench = {10, 11}.
    // corpus 2 (x-dir) ~ bench 10 (x-dir, cell 0): contaminated.
    // corpus 3 (y-dir) ~ bench 11 (y-dir, cell 1): contaminated.
    // corpus 4 lands in cell 0 but near-orthogonal to bench 10: clean.
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (2L, Array(2.0f, 0.1f)),
      (3L, Array(0.1f, 2.0f)),
      (4L, Array(1.0f, 0.95f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((10L, Array(3.0f, 0.0f)), (11L, Array(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(corpus, bench, cents,
        "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 10L), (3L, 11L)), s"got $got")
    CacheScope.drain(spark)
  }

  test("int8 quantization: codes, scale, and error bound") {
    val in = Seq(
      (0L, Array(0.0f, 1.27f, -0.635f)),
      (1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(in, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2), r.getDouble(3))).toMap
    assert(out(0L)._1 == 0.01)
    assert(out(0L)._2 == Seq(0L, 127L, -63L)) // floor(-63.5+0.5) = -63
    assert(out(0L)._3 <= 0.01 / 2 + 1e-9) // within half a step
    assert(out(1L) == ((0.0, Seq(0L, 0L, 0L), 0.0)))
    // codes stay in int8 range on real data
    val emb = graft.model.GraphStore.table(spark, sfDir, "embeddings")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    import org.apache.spark.sql.functions.{array_max => amax, array_min => amin, col => c}
    val bad = q.filter(amax(c("qvec")) > 127 || amin(c("qvec")) < -127)
    assert(bad.count() == 0)
  }

  test("pqCodes: every vector coded per subspace, codes spread over cells") {
    val emb = graft.model.GraphStore.table(spark, sfDir, "embeddings")
    val n = emb.count()
    val out = Similarity.pqCodes(emb, "vec_id", "embedding",
      m = 2, k = 4, iters = 2, dim = 64).cache()
    assert(out.count() == n * 2) // one code per (vector, subspace)
    assert(out.groupBy("vec_id").count().filter($"count" =!= 2)
      .count() == 0)
    // codes are valid cell ids
    assert(out.filter($"code" < 0 || $"code" >= 4).count() == 0)
    // quantizer actually discriminates: >1 distinct code per subspace
    val spread = out.groupBy("sub")
      .agg(countDistinct($"code").as("k")).collect()
    assert(spread.forall(_.getAs[Long]("k") > 1L),
      s"degenerate codebook: ${spread.mkString(",")}")
    out.unpersist()
  }

  test("pqAdcTopK: complete ranked lists, distances ascend with rank") {
    val emb = graft.model.GraphStore.table(spark, sfDir, "embeddings")
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 2, 4, 2, 64)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb, 2, 64)
    val out = Similarity.pqAdcTopK(codes, cb,
      emb.filter($"vec_id" < 3), "vec_id", "embedding", 2, 64, k = 5)
      .cache()
    assert(out.groupBy("query_id").count()
      .filter($"count" =!= 5).count() == 0)
    // d2 non-decreasing in rank within each query
    import org.apache.spark.sql.expressions.Window
    val lagged = out.withColumn("prev",
      lag($"d2", 1).over(Window.partitionBy($"query_id").orderBy($"rk")))
    assert(lagged.filter($"prev".isNotNull && $"d2" < $"prev")
      .count() == 0)
    // ADC distance to a vector sharing ALL the query's codes equals the
    // query's own table entries summed — in particular the query itself
    // appears with the minimal distance of its code cell
    assert(out.filter($"rk" === 1 && $"d2" < 0).count() == 0)
    out.unpersist()
  }

  test("pqRerankTopK: exact distances, recall >= plain ADC recall") {
    val emb = graft.model.GraphStore.table(spark, sfDir, "embeddings")
    val qids = (0L to 2L)
    val exact = Similarity.bruteForceTopKL2(emb, "vec_id", "embedding",
      qids, k = 5).cache()
    val rerank = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
      qids, k = 5, candidates = 30, m = 2, kCodes = 4, iters = 2,
      dim = 64)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 2, 4, 2, 64)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb, 2, 64)
    val adc = Similarity.pqAdcTopK(codes, cb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", 2, 64, k = 5)
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallPerQuery(exact, approx)
        .agg(avg($"recall")).head.getDouble(0)
    val (rAdc, rRerank) = (recall(adc), recall(rerank))
    assert(rRerank >= rAdc,
      s"re-rank recall $rRerank should not trail ADC recall $rAdc")
    // complete lists, exact distances ascend with rank
    val rr = rerank.cache()
    assert(rr.groupBy("query_id").count().filter($"count" =!= 5)
      .count() == 0)
    val lagged = rr.withColumn("prev", lag($"d2", 1).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"rk")))
    assert(lagged.filter($"prev".isNotNull && $"d2" < $"prev")
      .count() == 0)
    rr.unpersist()
    exact.unpersist()
    // candidate pool must cover k
    intercept[IllegalArgumentException] {
      Similarity.pqRerankTopK(emb, "vec_id", "embedding", qids,
        k = 10, candidates = 5, m = 2, kCodes = 4, iters = 2, dim = 64)
    }
  }

  test("contrastivePairs: hard negatives surface, labels mark polarity") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),  // anchor (0 % 5 == 0)
      (1L, Array(0.99f, 0.14f, 0.0f), 0), // near-parallel, same class
      (2L, Array(0.98f, 0.2f, 0.0f), 1),  // near-parallel, OTHER class
      (3L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal
      (5L, Array(0.0f, 0.0f, 1.0f), 2)    // anchor too (5 % 5 == 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastivePairs(emb, "vec_id", "embedding",
      "label", anchorMod = 5L, k = 2)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(3), r.getInt(4)))
    // two anchors, k pairs each, never self-paired
    assert(rows.map(_._1).toSet == Set(0L, 5L))
    assert(rows.count(_._1 == 0L) == 2 && rows.count(_._1 == 5L) == 2)
    assert(rows.forall(r => r._1 != r._2))
    // anchor 0's top-2 are the near-parallel vectors in sim order;
    // the same-class one is positive, the cross-class one a hard negative
    val a0 = rows.filter(_._1 == 0L).sortBy(_._3)
    assert(a0.map(_._2).toSeq == Seq(1L, 2L))
    assert(a0.map(_._4).toSeq == Seq(1, 0))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fixture text is pure ASCII at every scale (oracle byte=char law)") {
    // q_multimodal_features' oracle reads bytes as ascii(substr(text,i))
    // per CHARACTER while the Spark side sums UTF-8 encode() BYTES —
    // byte-exact only while the fixture is pure ASCII (VERDICT.md r5
    // minor #5). Assert it at every generated scale so a testdata
    // regeneration cannot silently split the two.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
        assert(nonAscii == 0, s"$sf has $nonAscii non-ASCII documents — " +
          "q_multimodal_features' ascii(substr()) oracle is no longer " +
          "byte-exact; switch the oracle to a UTF-8 byte expansion")
      }
    }
  }

  test("synthesize -> decode round-trips spec dims through real codecs") {
    val docs = (0L to 11L).toDF("doc_id") // 4 of each: png/bmp/wav
    val media = Multimodal.synthesize(docs, "doc_id")
    val decoded = Multimodal.decode(media)
    val rows = decoded.collect().map(d => d.id -> d).toMap
    for (id <- 0L to 11L) {
      val d = rows(id)
      assert(d.format == Multimodal.specFormat(id))
      assert(d.n_bytes > 0)
      if (d.format == "wav") {
        assert(d.width == 0 && d.height == 0)
        assert(d.n_frames == Multimodal.specFrames(id))
      } else {
        assert(d.width == Multimodal.specWidth(id))
        assert(d.height == Multimodal.specHeight(id))
        assert(d.n_frames == 1)
      }
    }
    val resized = Multimodal.resizePlan(decoded, maxSide = 16)
    assert(resized.filter(col("out_w") > 16 || col("out_h") > 16)
      .count() == 0)
    val frames = Multimodal.sampleFrames(decoded, step = 2)
    // id=2 is wav with specFrames(2)=3 -> sampled frames 0,2
    assert(frames.filter(col("id") === 2L).count() == 2)
  }

  test("pixelStats recovers exact spec pixel sums from decoded rasters") {
    val docs = (0L to 11L).toDF("doc_id")
    val st = Multimodal.pixelStats(Multimodal.synthesize(docs, "doc_id"))
      .collect().map(p => p.id -> p).toMap
    for (id <- 0L to 11L) {
      val (n, s) =
        if (Multimodal.specFormat(id) == "wav") {
          val nf = Multimodal.specFrames(id)
          (nf.toLong,
            (0 until nf).map(i => Multimodal.specPixel(id, i, 0).toLong).sum)
        } else {
          val (w, h) = (Multimodal.specWidth(id), Multimodal.specHeight(id))
          (w.toLong * h,
            (for (x <- 0 until w; y <- 0 until h)
              yield Multimodal.specPixel(id, x, y).toLong).sum)
        }
      assert(st(id).n_px == n && st(id).px_sum == s,
        s"id=$id: got (${st(id).n_px}, ${st(id).px_sum}), want ($n, $s)")
    }
  }

  test("byte features: exact sums, mean and entropy on known payloads") {
    val docs = Seq((0L, "ab"), (1L, "aaaa"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.ingest(docs, "doc_id", "text")
      .as[Multimodal.MediaRow](Multimodal.mediaEnc)
    val f = Multimodal.features(media).collect()
      .map(r => r.id ->
        ((r.n_bytes, r.byte_sum, r.mean_byte, r.byte_entropy))).toMap
    assert(f(0L)._1 == 2L && f(0L)._2 == 195L && f(0L)._3 == 97.5)
    assert(math.abs(f(0L)._4 - 1.0) < 1e-12)   // two equiprobable bytes
    assert(f(1L) == ((4L, 388L, 97.0, 0.0)))    // constant payload
    assert(f(2L) == ((0L, 0L, 0.0, 0.0)))       // empty payload guarded
  }

  test("ingest format labels all route to a real codec branch") {
    val docs = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val fmts = Multimodal.ingest(docs, "doc_id", "text")
      .select("id", "format").as[(Long, String)].collect().toMap
    assert(fmts == Map(0L -> "png", 1L -> "bmp", 2L -> "wav"))
    assert(fmts.values.toSet subsetOf
      (0L to 2L).map(Multimodal.specFormat).toSet)
  }
}
