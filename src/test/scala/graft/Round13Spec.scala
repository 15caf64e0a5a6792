package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics
import graft.pipeline.{Similarity, TextAnalysis}

/** Round-13 additions: the likelihood-loss unigram pruner and its
  * shrink schedule, the normalized uncovered-word sentinel in
  * viterbiSegments, the ivfOccupancyDrift degenerate guard, and
  * louvainLevels' type-stable schema. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("unigramKeepSize interpolates seed to target and lands exactly") {
    val sched = (1 to 4).map(TextAnalysis.unigramKeepSize(100, 20, 4, _))
    assert(sched == Seq(80, 60, 40, 20), s"schedule: $sched")
    assert(sched.zip(sched.tail).forall { case (a, b) => a >= b })
    // degenerate: seed below target never inflates past the target
    assert(TextAnalysis.unigramKeepSize(10, 20, 3, 1) == 20)
  }

  test("unigramTrainLoss keeps the coverage floor and the shrunk budget") {
    val docs = Seq("aaab aaab ab zq zq aaab").toDF("text")
    val v = TextAnalysis.unigramTrainLoss(docs, "text", maxPieceLen = 3,
      seedSize = 5, vocabSize = 2, nRounds = 2)
    val toks = v.collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "z", "q").subsetOf(toks),
      s"single chars pruned: $toks")
    assert(toks.count(_.length >= 2) <= 2, s"budget failed: $toks")
  }

  test("loss prune keeps an expensive-to-replace token over a cheap concat") {
    // Candidates after the E-step: 'xy' is a cheap 2-single concat
    // (krepl=2, loss=cnt); 'pqr' has no 2-gram children in the vocab
    // once the budget shrinks, so krepl=3 doubles its loss. Corpus
    // tuned so usage(xy) > usage(pqr) but loss(pqr) > loss(xy):
    // usage pruning and loss pruning must disagree on the final token.
    val docs = Seq(Seq.fill(8)("xy").mkString(" ") + " " +
      Seq.fill(5)("pqr").mkString(" ")).toDF("text")
    val usage = TextAnalysis.unigramTrain(docs, "text", maxPieceLen = 3,
      seedSize = 8, vocabSize = 1, nRounds = 3)
      .collect().map(_.getString(0)).filter(_.length >= 2).toSet
    val loss = TextAnalysis.unigramTrainLoss(docs, "text",
      maxPieceLen = 3, seedSize = 8, vocabSize = 1, nRounds = 3)
      .collect().map(_.getString(0)).filter(_.length >= 2).toSet
    assert(usage == Set("xy"), s"usage pruner: $usage")
    assert(loss == Set("pqr"), s"loss pruner: $loss")
  }

  test("viterbiSegments emits the sentinel row for BOTH uncovered cases") {
    // vocab with no coverage floor: 'ab' matches a piece but cannot
    // complete ('c' missing); 'zz' matches nothing at all. Both must
    // surface as sentinel rows, not one row and one silent absence.
    val wf = Seq(("abc", 2L), ("zz", 1L), ("ab", 3L)).toDF("w", "f")
    val vocab = Seq(("ab", 5L)).toDF("tok", "cnt")
    val got = TextAnalysis.viterbiSegments(wf, vocab, maxPieceLen = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.isNullAt(4)))).toMap
    assert(got.size == 3, s"one row per input word: $got")
    assert(got("abc") == ((999999L, true)), s"partial-match: $got")
    assert(got("zz") == ((999999L, true)), s"zero-match: $got")
    assert(got("ab") == ((1L, false)), s"covered word: $got")
  }

  test("ivfOccupancyDrift fails loudly on an empty trained index") {
    val trained = Seq.empty[(Long, Long)].toDF("cell", "n")
    val appended = Seq((1L, 0L)).toDF("vec_id", "cell")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfOccupancyDrift(trained, appended).collect()
    }
    assert(ex.getMessage.contains("empty"), ex.getMessage)
  }

  test("louvainLevels returns the long schema for Int-typed edges") {
    val intEdges = Seq((1, 2), (2, 3), (1, 3)).toDF("a", "b")
    val got = GraphAnalytics.louvainLevels(intEdges, maxLevels = 1,
      roundsPerLevel = 2)
    val emptyEdges = Seq.empty[(Int, Int)].toDF("a", "b")
    val empty = GraphAnalytics.louvainLevels(emptyEdges, maxLevels = 1,
      roundsPerLevel = 2)
    // name + type (nullability is a plan artifact the gate's parquet
    // round trip erases anyway)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      empty.schema.map(f => (f.name, f.dataType)),
      s"paths disagree: ${got.schema} vs ${empty.schema}")
    assert(got.count() > 0 && empty.count() == 0)
  }

  // ---- Leiden refinement (Traag et al. 2019) ----

  /** Ring of 5-cliques + disconnection gadgets: chain A−B−C whose cut
    * vertex B also has 3 edges into a clique — once the clique
    * consolidates, B defects (w=3 beats its own w=2), stranding the
    * non-adjacent A and C under B's old label: the Fig. 2 defect. */
  private def gadgetGraph(nCliques: Int, nGadgets: Int) = {
    val clique = for {
      q <- 0 until nCliques; i <- 0 until 5; j <- (i + 1) until 5
    } yield ((q * 5 + i).toLong, (q * 5 + j).toLong)
    val ring = (0 until nCliques).map(q =>
      ((q * 5).toLong, (((q + 1) % nCliques) * 5).toLong))
    val gadgets = (0 until nGadgets).flatMap { g =>
      val (a, c, b) = (1000L + g, 1100L + g, 1200L + g)
      Seq((a, b), (c, b)) ++
        (0 until 3).map(j => (b, ((g % nCliques) * 5 + j).toLong))
    }
    (clique ++ ring ++ gadgets).toDF("a", "b")
  }

  /** (level, community) -> number of connected components of the
    * community's induced subgraph in the ORIGINAL graph. */
  private def componentsPerCommunity(edges: org.apache.spark.sql.DataFrame,
      levels: org.apache.spark.sql.DataFrame) = {
    val e = edges.toDF("a", "b")
    levels.select("level").distinct().collect().map(_.getLong(0)).map { l =>
      val cm = levels.filter(col("level") === l)
        .select(col("_vid").as("x"), col("community").as("c"))
      val intra = e
        .join(cm.select(col("x").as("a"), col("c").as("ca")), "a")
        .join(cm.select(col("x").as("b"), col("c").as("cb")), "b")
        .filter(col("ca") === col("cb")).select("a", "b")
      val comp = GraphAnalytics.ccBigStar(intra, rounds = 30)
      val n = cm.join(comp.withColumnRenamed("_vid", "x"), Seq("x"), "left")
        .select(col("c"),
          coalesce(col("component"), col("x")).as("comp"))
        .groupBy("c").agg(countDistinct(col("comp")).as("n"))
      l -> n.agg(max(col("n"))).head().getLong(0)
    }.toMap
  }

  test("leidenLevels: every emitted community is connected; louvain's is not") {
    val e = gadgetGraph(nCliques = 12, nGadgets = 24)
    val louvain = GraphAnalytics.louvainLevels(e, maxLevels = 3,
      roundsPerLevel = 4)
    val leiden = GraphAnalytics.leidenLevels(e, maxLevels = 3,
      roundsPerLevel = 4)
    val maxCompLouvain = componentsPerCommunity(e, louvain)
    val maxCompLeiden = componentsPerCommunity(e, leiden)
    // the fixture must actually exercise the defect, else this test
    // proves nothing — tune gadget count/parities if this trips
    assert(maxCompLouvain.values.max >= 2L,
      s"fixture too weak, louvain stayed connected: $maxCompLouvain")
    assert(maxCompLeiden.values.forall(_ == 1L),
      s"leiden emitted a disconnected community: $maxCompLeiden")
    // refinement never lowers level-1 modularity (same move phase,
    // split of a disconnected community only shrinks Σ vol²)
    def q1(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("level") === 1).select("q_num").head().getLong(0)
    assert(q1(leiden) >= q1(louvain),
      "refinement lowered level-1 Q")
  }

  test("leidenLevels == louvainLevels when every move community is connected") {
    // a single clique: the move phase consolidates it whole; the
    // refinement CC is one component per community — provably inert
    val e = (for { i <- 0 until 6; j <- (i + 1) until 6 }
      yield (i.toLong, j.toLong)).toDF("a", "b")
    val louvain = GraphAnalytics.louvainLevels(e, 2, 4).collect().toSet
    val leiden = GraphAnalytics.leidenLevels(e, 2, 4).collect().toSet
    assert(louvain == leiden, s"inert refinement diverged")
  }

  // ---- BM25 (Robertson & Walker 1994, Lucene idf variant) ----

  test("bm25TopK: hand-checked scores, rank order, and laws") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "cat dog cat"),          // tf(cat)=2, dl=3
      (2L, "cat"),                  // tf(cat)=1, dl=1
      (3L, "dog dog dog dog"),      // dl=4
      (4L, "bird bird")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "cat"), (1L, "cat bird")), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    // query 0 "cat": docs 1 and 2 match. N=4, df(cat)=2, avgdl=2.5.
    // idf = ln(1 + 2.5/2.5) = ln 2. Shorter doc 2 with tf=1:
    // tfn = 2.2/(1 + 1.2*(0.25+0.75*0.4)) = 2.2/1.66; doc 1 tf=2 dl=3:
    // tfn = 4.4/(2+1.2*(0.25+0.9)) = 4.4/3.38
    val k1 = 1.2; val b = 0.75
    def tfn(tf: Double, dl: Double) =
      tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl * 4.0 / 10.0))
    def dy(x: Double) = math.floor(x * 1073741824.0) / 1073741824.0
    val idf2 = math.log(1.0 + (4.0 - 2.0 + 0.5) / 2.5)
    assert(math.abs(got((0L, 1L))._3 - dy(idf2 * tfn(2, 3))) < 1e-12)
    assert(math.abs(got((0L, 2L))._3 - dy(idf2 * tfn(1, 1))) < 1e-12)
    // for "cat", length normalization beats raw tf at these dials:
    // doc 2 (tf=1, dl=1) = 0.9186 outranks doc 1 (tf=2, dl=3) = 0.9023
    assert(got((0L, 2L))._1 == 1 && got((0L, 1L))._1 == 2)
    assert(!got.contains((0L, 3L)) && !got.contains((0L, 4L)))
    // query 1 "cat bird": doc 4 matches rarer 'bird' (df=1) with its
    // whole length and must outrank both cat docs
    assert(got((1L, 4L))._1 == 1, s"rare-term doc must rank first: $got")
    assert(got((1L, 4L))._2 == 1L && got((1L, 1L))._2 == 1L)
  }

  test("bm25TopK is partition-invariant and respects k") {
    import graft.pipeline.TextAnalysis
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 3 == 0) "alpha beta gamma" else "beta delta"))
      .toDF("doc_id", "text")
    val q = Seq((7L, "alpha beta"))
    val a = TextAnalysis.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val b = TextAnalysis.bm25TopK(docs.repartition(11), "doc_id",
      "text", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(a == b, "bm25 rank set changed under repartition")
    assert(a.size == 5, s"k=5 expected, got ${a.size}")
  }

  // ---- k-means|| seeding (Bahmani et al. 2012) ----

  test("kmeansParallelInit: seed, weights partition the corpus, invariance") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.kmeansParallelInit(emb, "vec_id", "embedding",
      ell = 8, rounds = 2)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the round-0 seed is the min-id vector
    val seeds = rows.filter(_._2 == 0L)
    assert(seeds.map(_._1).toSeq == Seq(0L), s"seed: ${seeds.toSeq}")
    // oversampling drafted more candidates beyond the seed
    assert(rows.length > 1, "no candidate ever drafted")
    // nearest-candidate weights partition the corpus exactly
    assert(rows.map(_._3).sum == emb.count(),
      s"weights must sum to corpus size: ${rows.toSeq}")
    // deterministic under repartition
    val again = Similarity.kmeansParallelInit(emb.repartition(7),
      "vec_id", "embedding", ell = 8, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet, "repartition changed the draft")
  }

  // ---- SQ8 scalar-quantized ANN serving ----

  test("sq8TopK: integer scores, self-excluded, high recall, invariance") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.sq8TopK(emb, "vec_id", "embedding",
      queryIds = (0L to 4L), k = 5)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 25, s"5 queries x k=5: ${rows.length}")
    assert(rows.forall(r => r._1 != r._2), "self must be excluded")
    // code dots are bounded by 127^2 * dim
    assert(rows.forall(r => math.abs(r._3) <= 127L * 127L * 64L))
    // quantization keeps most of the exact top-k (unit vectors, 8 bit)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryIds = (0L to 4L), k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = rows.count(r => exact((r._1, r._2)))
    assert(hit * 10 >= exact.size * 7, s"recall too low: $hit/${exact.size}")
    val again = Similarity.sq8TopK(emb.repartition(7), "vec_id",
      "embedding", queryIds = (0L to 4L), k = 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows.toSet == again, "repartition changed sq8 ranking")
  }

  // ---- Balanced k-way partition refinement ----

  test("balancedPartition: cut improves, parts valid, invariance") {
    // ring of 24 5-cliques: hash init scatters each clique over the
    // parts; refinement should pull cliques together
    val e = (for {
      q <- 0 until 24; i <- 0 until 5; j <- (i + 1) until 5
    } yield ((q * 5 + i).toLong, (q * 5 + j).toLong)) ++
      (0 until 24).map(q => ((q * 5).toLong, (((q + 1) % 24) * 5).toLong))
    val edges = e.toDF("a", "b")
    val parts = GraphAnalytics.balancedPartition(edges, k = 4,
      rounds = 4, capPermille = 1300)
    val rows = parts.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 120 && rows.map(_._1).distinct.length == 120)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 4 &&
      r._3 >= 0 && r._3 < 4), "part ids out of range")
    def cut(sel: ((Long, Long, Long)) => Long): Int = {
      val m = rows.map(r => r._1 -> sel(r)).toMap
      e.count { case (u, v) => m(u) != m(v) }
    }
    val (ci, cr) = (cut(_._2), cut(_._3))
    assert(cr < ci, s"refinement must reduce the cut: init=$ci refined=$cr")
    // quality audit agrees with the hand cut
    val q = GraphAnalytics.partitionQuality(edges,
      parts.select(col("_vid"), col("part")))
    val cutPm = q.select("cut_permille").head().getLong(0)
    assert(cutPm == cr * 1000L / e.size, s"audit cut: $cutPm vs $cr")
    val again = GraphAnalytics.balancedPartition(edges.repartition(9),
      k = 4, rounds = 4, capPermille = 1300).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.toSet == again, "repartition changed the placement")
  }

  test("leidenLevels is partition-invariant") {
    val e = gadgetGraph(nCliques = 6, nGadgets = 8)
    val a = GraphAnalytics.leidenLevels(e, 2, 4).collect().toSet
    val b = GraphAnalytics.leidenLevels(e.repartition(13), 2, 4)
      .collect().toSet
    assert(a == b, "repartition changed the leiden partition")
  }

  test("wordpieceTrain picks the likelihood merge, not the count merge") {
    // 'aa' x9 vs 'zq' x2: BPE merges the frequent pair (a a, cnt 9);
    // WordPiece scores a-a at 9/(18*18) but z-q at 2/(2*2) and must
    // merge the above-chance rare pair first
    val docs = Seq((Seq.fill(9)("aa") ++ Seq.fill(2)("zq"))
      .mkString(" ")).toDF("text")
    val bpe = TextAnalysis.bpeTrain(docs, "text", nMerges = 1)
      .collect().head.getString(1)
    val wp = TextAnalysis.wordpieceTrain(docs, "text", nMerges = 1)
      .collect().head
    assert(bpe == "a a", s"bpe picked $bpe")
    assert(wp.getString(1) == "z q", s"wordpiece picked ${wp.getString(1)}")
    assert(wp.getLong(2) == 2L, s"cnt: ${wp.getLong(2)}")
    // score_x40 = floor(2 * 2^40 / (2*2)) = 2^39
    assert(wp.getLong(3) == (1L << 39), s"score: ${wp.getLong(3)}")
  }

  test("wordpieceEncodeCounts walks greedy longest-match with UNK law") {
    // vocab {a,b,c,ab,abc}: 'abcab' -> abc + ab (2 pieces, greedy
    // longest first); 'zz' has no match anywhere -> one [UNK]
    val docs = Seq((1L, "abcab zz abcab")).toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c", "ab", "abc").toDF("tok")
    val got = TextAnalysis.wordpieceEncodeCounts(docs, "doc_id", "text",
      vocab, maxPieceLen = 4).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((3L, 5L, 1L)), s"got $got")
  }

  test("tokenizerFertility rolls up exact permille ratios per source") {
    // vocab {a, b, ab}: "ab" = 1 piece, "a" = 1, "b a" = 2 pieces;
    // source s1: doc "ab ab" (2 words, 2 pieces, 4 chars);
    // source s2: doc "a b ab" (3 words, 3 pieces, 4 chars)
    val docs = Seq((1L, "s1", "ab ab"), (2L, "s2", "a b ab"))
      .toDF("doc_id", "source", "text")
    val vocab = Seq("a", "b", "ab").toDF("tok")
    val got = TextAnalysis.tokenizerFertility(docs, "doc_id", "text",
      "source", vocab, maxPieceLen = 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == Map(
      "s1" -> ((2L, 2L, 4L, 1000L, 2000L)),
      "s2" -> ((3L, 3L, 4L, 1000L, 1333L))), s"got $got")
  }

  test("wordpieceBertTrain separates initial and continuation counts") {
    // "ab" x4 + "cab" x4: the position-agnostic trainer pools 'a b'
    // across both words (score ties resolved to 'a b'); the BERT
    // trainer sees (a,##b) at 1/8, (##a,##b) at 1/8, but (c,##a) at
    // 1/4 — the annotation changes the argmax
    val docs = Seq((Seq.fill(4)("ab") ++ Seq.fill(4)("cab"))
      .mkString(" ")).toDF("text")
    val plain = TextAnalysis.wordpieceTrain(docs, "text", 1)
      .collect().head.getString(1)
    val bert = TextAnalysis.wordpieceBertTrain(docs, "text", 1)
      .collect().head
    assert(plain == "a b", s"plain picked $plain")
    assert(bert.getString(1) == "c ##a", s"bert picked ${bert.getString(1)}")
    // score = floor(4 * 2^40 / (4*4)) = 2^38
    assert(bert.getLong(3) == (1L << 38), s"score ${bert.getLong(3)}")
  }

  test("wordpieceBertEncodeCounts enforces the position inventories") {
    // vocab: initial {a, b, ab}, continuation {##b}: 'ab' -> one
    // initial piece; 'bb' -> b + ##b; 'ba' -> UNK (no ##a)
    val docs = Seq((1L, "ab ba bb")).toDF("doc_id", "text")
    val vocab = Seq(("a", 0L), ("b", 0L), ("ab", 0L), ("##b", 1L))
      .toDF("tok", "is_cont")
    val got = TextAnalysis.wordpieceBertEncodeCounts(docs, "doc_id",
      "text", vocab, maxPieceLen = 4).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((3L, 4L, 1L)), s"got $got")
  }

  test("wordpieceTrain is partition-invariant") {
    val docs = (1 to 120).map(i =>
      s"tok${i % 7} alpha beta tok${i % 5} gamma").toDF("text")
    val a = TextAnalysis.wordpieceTrain(docs, "text", 4)
      .collect().toSeq
    val b = TextAnalysis.wordpieceTrain(docs.repartition(13), "text", 4)
      .collect().toSeq
    assert(a == b, s"repartition changed merges: $a vs $b")
  }

  test("katzCentrality matches the hand-computed recurrence") {
    // 1->2->3 plus 1->3, alpha=0.5, beta=1: r(1)=1 (no in-edges),
    // r(2)=1+0.5*r(1)=1.5, r(3)=1+0.5*(r(1)+r(2))=2.25 at fixpoint
    // (reached by iter 2; parallel duplicate of 1->3 must collapse)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 3L)).toDF("s", "d")
    val got = GraphAnalytics.katzCentrality(edges, iters = 3,
      alpha = 0.5, beta = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.5, 3L -> 2.25), s"katz: $got")
  }

  test("eigenvectorCentrality: hand fixpoint and the DAG zero-mass law") {
    // 2-cycle 1<->2 plus spectator 3->1: fixpoint puts all mass on the
    // cycle; L1 keeps the simplex. Round 1: raw(1)=2, raw(2)=1, t=3;
    // round 2: raw(1)=1/3, raw(2)=2/3 (3's score is 0 from round 1 on)
    val cyc = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("s", "d")
    val got = GraphAnalytics.eigenvectorCentrality(cyc, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) == 0.0 && math.abs(got(1L) - 1.0 / 3) < 1e-6 &&
      math.abs(got(2L) - 2.0 / 3) < 1e-6, s"cycle: $got")
    // pure DAG: mass drains after the diameter; defined as all-zero
    val dag = Seq((2L, 1L), (3L, 1L)).toDF("s", "d")
    val z = GraphAnalytics.eigenvectorCentrality(dag, iters = 3)
      .collect().map(_.getDouble(1))
    assert(z.forall(_ == 0.0), s"dag must drain to zero: ${z.toSeq}")
  }

  test("graphAnnTopK walks the beam toward the query's neighborhood") {
    // unit vectors at 20-degree steps: sim to the query (id 0) is
    // strictly decreasing in id; the graph is the chain 5-4-3-2-1 and
    // the entry point is the WORST vertex (5) — 4 rounds of beam
    // search must walk all the way down and rank 1 first
    def v(i: Int) = {
      val th = math.toRadians(20.0 * i)
      Array(math.cos(th).toFloat, math.sin(th).toFloat)
    }
    val emb = (0 to 5).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)).toDF("a", "b")
    val got = Similarity.graphAnnTopK(emb, "vec_id", "embedding",
      edges, queryIds = Seq(0L), entryIds = Seq(5L),
      beam = 2, rounds = 4, k = 5)
      .collect().map(r => r.getLong(3) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L),
      s"ranked: $got")
    val again = Similarity.graphAnnTopK(emb.repartition(5), "vec_id",
      "embedding", edges.repartition(3), Seq(0L), Seq(5L), 2, 4, 5)
      .collect().map(r => r.getLong(3) -> r.getLong(1)).toMap
    assert(again == got, "repartition changed the walk")
  }

  test("richClub counts the induced high-degree subgraph exactly") {
    // K4 on {1,2,3,4} (deg 3 each) plus pendant 5-1 (deg(1)=4,
    // deg(5)=1): at k=2 the rich set is {1,2,3,4} with all 6 K4
    // edges; at k=3 only vertex 1 survives (no pairs, phi_den 0)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("a", "b")
    val got = GraphAnalytics.richClub(e, Seq(2, 3))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      2L -> ((4L, 6L, 12L, 12L)),
      3L -> ((1L, 0L, 0L, 0L))), s"got $got")
  }

  test("qualityGate reason bits match the integer law exactly") {
    val docs = Seq(
      1L -> ("the cat sat of mat and runs to park in story is fine " +
        "it goes well done more words here extra tail words now"),
      2L -> "short doc only",                        // bit 1 (too few)
      3L -> Seq.fill(25)("a").mkString(" "),         // bits 2+16 (len/dup)
      4L -> (Seq.fill(22)("wordy").mkString(" ") + " !!!; ., .,;; ..!"),
      5L -> ("the of " + (1 to 22).map(i => s"w$i ..").mkString(" ")))
    val out = TextAnalysis.qualityGate(docs.toDF("doc_id", "text"),
      "doc_id", "text", minTok = 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val want = docs.map { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      val nTok = t.length.toLong
      val nChar = t.map(_.length.toLong).sum
      val nPunct = text.count(".,!?;:".contains(_)).toLong
      val nStop = t.count(stop).toLong
      val nDup = nTok - t.distinct.length
      val bits = (if (nTok < 20 || nTok > 100000) 1L else 0L) +
        (if (nChar < 3 * nTok || nChar > 10 * nTok) 2L else 0L) +
        (if (10 * nPunct > nTok) 4L else 0L) +
        (if (nStop < 2) 8L else 0L) +
        (if (10 * nDup > 3 * nTok) 16L else 0L)
      id -> ((nTok, bits, if (bits == 0L) 1L else 0L))
    }.toMap
    assert(out == want, s"got $out want $want")
    assert(out(1L)._3 == 1L, "doc 1 must pass")
    assert(out.values.count(_._3 == 0L) == 4, "docs 2-5 must fail")
  }

  test("knBigrams emits the exact interpolated-KN rationals") {
    // corpus "a b a b a c": c12 ab=2 ba=2 ac=1; c(a)=3 n1p(a)=2;
    // c(b)=2 n1p(b)=1; n1m(a)=n1m(b)=n1m(c)=1; Npp=3
    val docs = Seq("a b a b a c").toDF("text")
    val byPair = TextAnalysis.knBigrams(docs, "text", minCount = 1)
      .select("w1", "w2", "c12", "p_num", "p_den")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byPair == Map(
      ("a", "b") -> ((2L, 21L, 36L)), // (4*2-3)*3 + 3*2*1 = 21 / 36
      ("b", "a") -> ((2L, 18L, 24L)), // (4*2-3)*3 + 3*1*1 = 18 / 24
      ("a", "c") -> ((1L, 9L, 36L))), // (4*1-3)*3 + 3*2*1 = 9 / 36
      s"got $byPair")
    // seen-mass identity for context 'a': 21/36 + 9/36 = 30/36, the
    // missing 6/36 is exactly the reserved discount mass D*N1p/c(a)
    // = (3/4)*2/3 = 1/2 times the unseen continuation share (pcont of
    // the one unseen continuation 'a' is 1/3: 1/2 * 1/3 = 6/36)
    assert(byPair(("a", "b"))._2 + byPair(("a", "c"))._2 == 30L)
  }

  test("temperatureMixture flattens a skewed mixture with the exact gate") {
    // 8:4:2:1 sources over 150 ids; alpha = 2^-2 via two exact sqrts
    val df = (0L until 150L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .withColumn("src_t",
        when(col("doc_id") % 15 < 8, lit("a"))
          .when(col("doc_id") % 15 < 12, lit("b"))
          .when(col("doc_id") % 15 < 14, lit("c"))
          .otherwise(lit("d")))
    val out = graft.pipeline.Curation
      .temperatureMixture(df, "doc_id", "src_t", sqrtDepth = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    // replay the exactly-rounded chain in plain scala
    val n = Map("a" -> 80L, "b" -> 40L, "c" -> 20L, "d" -> 10L)
    def dy(x: Double) = math.floor(x * 1073741824.0) / 1073741824.0
    val q = n.map { case (s, c) =>
      s -> dy(math.sqrt(math.sqrt(c.toDouble / 150.0))) }
    val z = q.values.sum // on-grid summands: any order is exact
    val f = q.map { case (s, qq) => s -> (qq / z * 150.0 / n(s)) }
    def srcOf(i: Long) = if (i % 15 < 8) "a" else if (i % 15 < 12) "b"
      else if (i % 15 < 14) "c" else "d"
    val want = (0L until 150L).flatMap { i =>
      val s = srcOf(i)
      val whole = math.floor(f(s)).toLong
      val frac = math.floor((f(s) - math.floor(f(s))) * 4294967296.0).toLong
      val copies = whole +
        (if ((i * 2654435761L) % 4294967296L < frac) 1L else 0L)
      (1L to copies).map(c => (i, s, c))
    }.toSet
    assert(out == want,
      s"extra: ${out -- want} missing: ${want -- out}")
    // the flattening direction: rare 'd' gains copies, dominant 'a'
    // loses rows
    val perSrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perSrc("d") > 10 && perSrc("a") < 80, s"flattening: $perSrc")
  }

  test("singleLinkageCuts: dendrogram cuts match direct threshold-CC") {
    // chain 1-2(90) 2-3(80) 3-4(50) plus a separate pair 10-11(70);
    // cuts at 60, 85, 95 walk the dendrogram from coarse to singleton
    val edges = Seq((1L, 2L, 90L), (2L, 3L, 80L), (3L, 4L, 50L),
      (10L, 11L, 70L)).toDF("a", "b", "simx")
    val got = Similarity.singleLinkageCuts(edges, Seq(60L, 85L, 95L),
      maxRounds = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      (60L, 1L) -> 1L, (60L, 2L) -> 1L, (60L, 3L) -> 1L, (60L, 4L) -> 4L,
      (60L, 10L) -> 10L, (60L, 11L) -> 10L,
      (85L, 1L) -> 1L, (85L, 2L) -> 1L, (85L, 3L) -> 3L, (85L, 4L) -> 4L,
      (85L, 10L) -> 10L, (85L, 11L) -> 11L,
      (95L, 1L) -> 1L, (95L, 2L) -> 2L, (95L, 3L) -> 3L, (95L, 4L) -> 4L,
      (95L, 10L) -> 10L, (95L, 11L) -> 11L)
    assert(got == want, s"got $got")
    val again = Similarity.singleLinkageCuts(edges.repartition(7),
      Seq(60L, 85L, 95L), maxRounds = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == got, "repartition changed the cuts")
  }

  test("pcaPower finds the dominant direction; pcaProject applies it") {
    // points (t, 2t): covariance is rank-1 along (1, 2); the L-inf
    // normalized top direction is (0.5, 1) and power iteration lands
    // on it in one round from the all-ones start
    val emb = Seq(-2, -1, 0, 1, 2).zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(t.toFloat, (2 * t).toFloat))
    }.toDF("vec_id", "embedding")
    val v = Similarity.pcaPower(emb, "vec_id", "embedding",
      dim = 2, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(v == Map(1 -> 0.5, 2 -> 1.0), s"loading: $v")
    // projection of (t, 2t) onto (0.5, 1) is 2.5t (data already
    // centered: the mean is the origin)
    val p = Similarity.pcaProject(emb, "vec_id", "embedding",
      dim = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Seq(-2, -1, 0, 1, 2).zipWithIndex
      .map { case (t, i) => i.toLong -> 2.5 * t }.toMap
    assert(p == want, s"proj: $p")
  }

  test("pcaPower2 deflates to the second direction") {
    // block-diagonal covariance: strong direction (1,2,0) (lambda 150)
    // plus weak orthogonal (0,0,1) (lambda 10) — deflation must hand
    // the second loop the weak axis
    val pts = for (t <- Seq(-2, -1, 0, 1, 2); u <- Seq(-1, 0, 1))
      yield Array(t.toFloat, (2 * t).toFloat, u.toFloat)
    val emb = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaPower2(emb, "vec_id", "embedding",
      dim = 3, iters = 6)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(math.abs(got(1)._1 - 0.5) < 1e-3 &&
      math.abs(got(2)._1 - 1.0) < 1e-3 && math.abs(got(3)._1) < 1e-3,
      s"loading1: $got")
    assert(got(3)._2 == 1.0 && math.abs(got(1)._2) < 0.01 &&
      math.abs(got(2)._2) < 0.01, s"loading2: $got")
    val again = Similarity.pcaPower2(emb.repartition(7), "vec_id",
      "embedding", 3, 6).collect().toSet
    assert(again == Similarity.pcaPower2(emb, "vec_id", "embedding",
      3, 6).collect().toSet, "repartition changed top-2")
  }

  test("pcaPower is partition-invariant and zero-variance-safe") {
    val emb = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * (d + 3) + d) % 11).toFloat / 7)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pcaPower(emb, "vec_id", "embedding", 8, 3)
      .collect().toSet
    val b = Similarity.pcaPower(emb.repartition(13), "vec_id",
      "embedding", 8, 3).collect().toSet
    assert(a == b, "repartition changed the loading")
    val const = (0L until 5L).map(i => (i, Array.fill(4)(2.5f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.pcaPower(const, "vec_id", "embedding", 4, 2)
      .collect().map(_.getDouble(1))
    assert(z.forall(_ == 0.0), s"constant corpus must load zero: ${z.toSeq}")
  }

  test("boruvkaMst equals Kruskal under the (w,u,v) total order") {
    // two separate components (0-39 and 100-139) so the FOREST case
    // is exercised; deterministic pseudo-random weights
    val raw = (0L until 40L).flatMap { i =>
      Seq((i, (i + 7) % 40, (i * 31 + 11) % 97),
        (i, (i * 3 + 1) % 40, (i * 17 + 5) % 97),
        (i + 100, (i + 13) % 40 + 100, (i * 23 + 2) % 97))
    }
    val edges = raw.toDF("a", "b", "w")
    val got = GraphAnalytics.boruvkaMst(edges, maxRounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // reference Kruskal over the same canonicalized edge set
    val canon = raw.filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2), t._3))
      .groupBy(t => (t._1, t._2))
      .map { case ((u, v), ts) => (ts.map(_._3).min, u, v) }
      .toSeq.sorted
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = canon.flatMap { case (w, u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }.toSet
    assert(got == kruskal,
      s"diff: ${(got -- kruskal)} / ${(kruskal -- got)}")
    val again = GraphAnalytics.boruvkaMst(edges.repartition(13), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(again == got, "repartition changed the forest")
  }

  test("boruvkaMst throws when the round budget can't span") {
    // cheap edges pair the vertices up in round 1; the expensive
    // inter-pair edges need a second round — so maxRounds=1 must
    // refuse rather than return a partial forest (a monotone chain
    // would NOT work here: every vertex hooks its left edge and the
    // whole path merges in one round)
    val cheap = (0L until 32L).map(i => (2 * i, 2 * i + 1, i))
    val dear = (0L until 31L).map(i => (2 * i + 1, 2 * i + 2, 1000 + i))
    val edges = (cheap ++ dear).toDF("a", "b", "w")
    intercept[IllegalStateException] {
      GraphAnalytics.boruvkaMst(edges, maxRounds = 1)
    }
    // and with budget it spans: a tree on 64 vertices has 63 edges
    assert(GraphAnalytics.boruvkaMst(edges, maxRounds = 6).count() == 63L)
  }

  test("katzCentrality is partition-invariant") {
    val edges = (1L to 400L)
      .flatMap(i => Seq((i, i % 37), (i, (i * 7) % 41)))
      .toDF("s", "d")
    val a = GraphAnalytics.katzCentrality(edges, iters = 4,
      alpha = 0.01).collect().toSet
    val b = GraphAnalytics.katzCentrality(edges.repartition(11),
      iters = 4, alpha = 0.01).collect().toSet
    assert(a == b, "repartition changed katz scores")
  }
}
