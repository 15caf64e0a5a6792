package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Round-15 additions: tokenizer decode + lossless round-trip for all
  * three byte-fallback families (piece sequences surfaced, byte
  * pieces in the "<0xHH>" surface, decode reassembles multi-octet
  * UTF-8 across consecutive byte pieces), and their count-consistency
  * with the established *_bytes encoders. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private val emoji = new String(Character.toChars(0x1F600)) // 4-byte

  // ---- BPE round-trip ----

  test("bpeRoundtrip: decode(encode(x)) == x across 1/2/3/4-byte " +
      "chars, and counts match bpeEncodeBytes") {
    val train = Seq("abab abab cd cd cd").toDF("text")
    val docs = Seq((1L, "abab axe"), (2L, "café 中文 cd"),
      (3L, "a" + emoji)).toDF("doc_id", "text")
    val rt = TextAnalysis.bpeRoundtrip(train, "text", docs,
      "doc_id", "text", nMerges = 4)
      .orderBy("doc_id").collect()
    val texts = docs.orderBy("doc_id").collect().map(_.getString(1))
    rt.zip(texts).foreach { case (r, t) =>
      assert(r.getAs[Boolean]("ok"), s"roundtrip failed: $r")
      assert(r.getAs[String]("decoded") == t,
        s"decoded '${r.getAs[String]("decoded")}' != '$t'")
    }
    // piece/byte counts agree with the counts-only encoder
    val cnt = TextAnalysis.bpeEncodeBytes(train, "text", docs,
      "doc_id", "text", nMerges = 4).orderBy("doc_id").collect()
    rt.zip(cnt).foreach { case (r, c) =>
      assert(r.getAs[Long]("n_pieces") == c.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_byte_pieces") ==
        c.getAs[Long]("n_byte_pieces"))
    }
  }

  test("bpeRoundtrip emits the byte-piece surface for uncovered " +
      "chars: é is exactly <0xC3> <0xA9>") {
    val train = Seq("ab ab").toDF("text")
    val docs = Seq((1L, "é")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeRoundtrip(train, "text", docs,
      "doc_id", "text", nMerges = 1).head()
    assert(r.getAs[Long]("n_pieces") == 2L)
    assert(r.getAs[Long]("n_byte_pieces") == 2L)
    assert(r.getAs[String]("decoded") == "é")
    assert(r.getAs[Boolean]("ok"))
  }

  // ---- WordPiece round-trip ----

  test("wordpieceRoundtrip: covered words reassemble from greedy " +
      "pieces, uncovered words from whole-word byte pieces") {
    val train = Seq("abab abab cd cd").toDF("text")
    val vocab = TextAnalysis.wordpieceVocab(train, "text", nMerges = 3)
    val docs = Seq((1L, "abab axé cd"), (2L, "中" + emoji))
      .toDF("doc_id", "text")
    val rt = TextAnalysis.wordpieceRoundtrip(docs, "doc_id", "text",
      vocab, maxPieceLen = 8).orderBy("doc_id").collect()
    assert(rt(0).getAs[Boolean]("ok") && rt(1).getAs[Boolean]("ok"),
      s"roundtrip failed: ${rt.mkString(";")}")
    assert(rt(0).getAs[String]("decoded") == "abab axé cd")
    assert(rt(1).getAs[String]("decoded") == "中" + emoji)
    // doc 2 is one word of 3+4 octets, fully uncovered -> 7 byte pieces
    assert(rt(1).getAs[Long]("n_pieces") == 7L)
    assert(rt(1).getAs[Long]("n_byte_pieces") == 7L)
    // counts agree with wordpieceEncodeBytes
    val cnt = TextAnalysis.wordpieceEncodeBytes(docs, "doc_id",
      "text", vocab, maxPieceLen = 8).orderBy("doc_id").collect()
    rt.zip(cnt).foreach { case (r, c) =>
      assert(r.getAs[Long]("n_pieces") == c.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_byte_pieces") ==
        c.getAs[Long]("n_byte_pieces"))
    }
  }

  // ---- Unigram round-trip ----

  test("unigramRoundtrip: Viterbi path splits into decodable pieces; " +
      "covered sub-spans still segment optimally inside fallback " +
      "words ([ab][é] mixing law)") {
    val train = Seq("ab ab ab a b").toDF("text")
    val docs = Seq((1L, "abé"), (2L, "ab a" + emoji))
      .toDF("doc_id", "text")
    val rt = TextAnalysis.unigramRoundtrip(train, "text", docs,
      "doc_id", "text", maxPieceLen = 4, seedSize = 8, vocabSize = 6,
      nRounds = 2).orderBy("doc_id").collect()
    rt.foreach(r => assert(r.getAs[Boolean]("ok"),
      s"roundtrip failed: $r"))
    assert(rt(0).getAs[String]("decoded") == "abé")
    // 'abé' = [ab] (vocab) + é as 2 byte pieces = 3 pieces, not 4
    // (true byte_fallback mixing — the r14-pinned law, now with the
    // sequence surfaced)
    assert(rt(0).getAs[Long]("n_pieces") == 3L, s"mixing: ${rt(0)}")
    assert(rt(0).getAs[Long]("n_byte_pieces") == 2L)
    assert(rt(1).getAs[String]("decoded") == "ab a" + emoji)
    // counts agree with unigramEncodeBytes
    val cnt = TextAnalysis.unigramEncodeBytes(train, "text", docs,
      "doc_id", "text", maxPieceLen = 4, seedSize = 8, vocabSize = 6,
      nRounds = 2).orderBy("doc_id").collect()
    rt.zip(cnt).foreach { case (r, c) =>
      assert(r.getAs[Long]("n_pieces") == c.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_byte_pieces") ==
        c.getAs[Long]("n_byte_pieces"))
    }
  }

  test("wordpieceBertRoundtrip: lossless IFF no [UNK] — covered " +
      "docs reconstruct through ##-stripping, uncovered words " +
      "surface the [UNK] marker") {
    val train = Seq("abab abab cd cd").toDF("text")
    val vocab = TextAnalysis.wordpieceBertVocab(train, "text",
      nMerges = 3)
    val docs = Seq((1L, "abab cd"), (2L, "abab axé cd"))
      .toDF("doc_id", "text")
    val rt = TextAnalysis.wordpieceBertRoundtrip(docs, "doc_id",
      "text", vocab, maxPieceLen = 8).orderBy("doc_id").collect()
    // doc 1 fully covered: lossless, zero UNK
    assert(rt(0).getAs[Boolean]("lossless") &&
      rt(0).getAs[Long]("n_unk") == 0L, s"covered: ${rt(0)}")
    assert(rt(0).getAs[String]("decoded") == "abab cd")
    // doc 2: 'axé' has é outside both inventories -> whole-word UNK,
    // NOT lossless — and the biconditional holds on both docs
    assert(!rt(1).getAs[Boolean]("lossless") &&
      rt(1).getAs[Long]("n_unk") == 1L, s"unk: ${rt(1)}")
    assert(rt(1).getAs[String]("decoded") == "abab [UNK] cd")
    assert(rt.forall(_.getAs[Boolean]("iff_ok")))
    // piece counts agree with the counts encoder (UNK word = 1 piece)
    val cnt = TextAnalysis.wordpieceBertEncodeCounts(docs, "doc_id",
      "text", vocab, maxPieceLen = 8).orderBy("doc_id").collect()
    rt.zip(cnt).foreach { case (r, c) =>
      assert(r.getAs[Long]("n_pieces") == c.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_unk") == c.getAs[Long]("n_unk"))
    }
  }

  // ---- clustered-corpus ANN recall certification ----

  test("mogEmbeddings is deterministic, clustered, and integer-valued") {
    val a = graft.pipeline.Similarity
      .mogEmbeddings(spark, n = 64, dim = 8, nClusters = 4)
      .orderBy("vec_id").collect()
    val b = graft.pipeline.Similarity
      .mogEmbeddings(spark, n = 64, dim = 8, nClusters = 4)
      .orderBy("vec_id").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val v0 = a(0).getSeq[Double](1)
    val v4 = a(4).getSeq[Double](1) // same cluster (4 % 4 == 0)
    val v1 = a(1).getSeq[Double](1) // different cluster
    assert(v0.forall(x => x == math.floor(x) && math.abs(x) <= 1050))
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) *
        math.sqrt(y.map(p => p * p).sum))
    }
    assert(cos(v0, v4) > 0.95, s"intra-cluster cos ${cos(v0, v4)}")
    assert(cos(v0, v1) < 0.9, s"inter-cluster cos ${cos(v0, v1)}")
  }

  test("clustered fixture: two-layer (IVF-entry) recall ≥ 0.9 and " +
      "strictly above same-budget fixed-entry recall — the coarse " +
      "layer buys RECALL on clustered data, not just a round") {
    import graft.pipeline.Similarity
    val s = spark
    def mean(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    val mog = Similarity.mogEmbeddings(s, n = 512, dim = 16,
      nClusters = 8)
    val knn = Similarity.exactKnnEdges(mog, "vec_id", "embedding",
      k = 8)
    val gt = Similarity.bruteForceTopK(mog, "vec_id", "embedding",
      queryIds = (0L to 15L), k = 5)
    val ivf = Similarity.recallPerQuery(gt,
      Similarity.graphAnnIvfTopK(mog, "vec_id", "embedding", knn,
        queryIds = (0L to 15L), nCells = 32, nProbe = 6,
        beam = 12, rounds = 6, k = 5)).collect()
    val fix = Similarity.recallPerQuery(gt,
      Similarity.graphAnnTopK(mog, "vec_id", "embedding", knn,
        queryIds = (0L to 15L),
        entryIds = Seq(0L, 1L, 2L, 3L, 4L, 5L),
        beam = 12, rounds = 6, k = 5)).collect()
    val (mi, mf) = (mean(ivf), mean(fix))
    assert(mi >= 0.9, s"two-layer mean recall $mi < 0.9")
    assert(mi > mf, s"two-layer $mi not above fixed-entry $mf")
  }

  // ---- finite-θ Leiden ----

  test("leidenFull finite-θ: recovers the same communities and Q as " +
      "the θ→∞ law on a two-community toy, at both a gain-blind " +
      "(huge θ) and a gain-sharp (θ=1) setting") {
    import graft.analytics.GraphAnalytics
    // two 4-cliques joined by one bridge edge
    val k4a = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val k4b = k4a.map { case (a, b) => (a + 10L, b + 10L) }
    val edges = (k4a ++ k4b :+ ((3L, 10L))).toDF("a", "b")
    def run(theta: Option[Long]) = {
      // read the deepest EMITTED level (the toy converges at level 1,
      // so level 2 never emits — Q-monotone stop)
      val all = GraphAnalytics
        .leidenFull(edges, maxLevels = 2, roundsPerLevel = 4,
          mergeSweeps = 2, theta = theta)
        .select("level", "_vid", "community", "q_num", "q_den")
        .collect()
      val lmax = all.map(_.getLong(0)).max
      all.filter(_.getLong(0) == lmax)
        .map(r => org.apache.spark.sql.Row(
          r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_.getLong(0))
    }
    val inf = run(None)
    val sharp = run(Some(1L))       // gains >> θ: near-greedy weights
    val blind = run(Some(1000000L)) // gains << θ: uniform weights
    def comm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    def q(rows: Array[org.apache.spark.sql.Row]) =
      rows.head.getLong(2).toDouble / rows.head.getLong(3)
    // both clique sides must be internally united in every law
    for ((rows, name) <- Seq((inf, "inf"), (sharp, "sharp"),
        (blind, "blind"))) {
      val c = comm(rows)
      assert((0L to 3L).map(c).distinct.size == 1, s"$name split k4a")
      assert((10L to 13L).map(c).distinct.size == 1, s"$name split k4b")
      assert(c(0L) != c(10L), s"$name merged the cliques")
    }
    assert(q(sharp) == q(inf) && q(blind) == q(inf),
      s"Q diverged: inf=${q(inf)} sharp=${q(sharp)} blind=${q(blind)}")
  }

  test("roundtrip decode law: consecutive byte pieces reassemble one " +
      "multi-octet char only through the single UTF-8 decode step " +
      "(no per-piece decode)") {
    // a word that is ENTIRELY unseen multibyte chars — decode must
    // concatenate 3+3 octets then decode once; a per-piece decode
    // would produce replacement chars
    val train = Seq("x x").toDF("text")
    val docs = Seq((1L, "中文")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeRoundtrip(train, "text", docs,
      "doc_id", "text", nMerges = 1).head()
    assert(r.getAs[String]("decoded") == "中文")
    assert(r.getAs[Long]("n_pieces") == 6L)
    assert(r.getAs[Boolean]("ok"))
  }
}
