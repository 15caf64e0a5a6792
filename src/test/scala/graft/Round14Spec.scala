package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics
import graft.pipeline.{Similarity, TextAnalysis}

/** Round-14 additions: byte-fallback BPE encode, full Leiden
  * (θ-sampled refinement + aggregate seeding), the hoisted
  * louvainMoveWeighted `pre` path, the checkpoint-stats cap, and the
  * r13 ADVICE hardenings (singleLinkageCuts degenerate inputs,
  * pcaPower2 zero-variance deflation). */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  // ---- byte-fallback BPE encode ----

  test("bpeEncodeBytes: covered words use merge symbols, uncovered " +
      "chars decompose to UTF-8 bytes, UNK is impossible") {
    val train = Seq("abab abab cd cd cd").toDF("text")
    // encode corpus: 'abab' covered (merges to <=2 symbols), 'cd'
    // covered, 'axe' has a,x?,e — 'x'/'e' unseen chars (1 byte each),
    // 'café' has 'f' unseen (1 byte) and 'é' unseen (2 bytes),
    // '中文' both unseen (3 bytes each); doc 3 pins the
    // supplementary-plane law — an emoji is ONE code point of
    // octet_length 4 on BOTH engines (Spark UTF8String split/length
    // are code-point-based, verified r14)
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, "abab axe"), (2L, "café 中文 cd"),
      (3L, "a" + emoji)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeBytes(train, "text", docs,
      "doc_id", "text", nMerges = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc 1: 'abab' trained to 1 symbol after 4 merges; 'axe' not in
    // vocab -> a covered (1) + x (1 byte) + e (1 byte) = 3 pieces,
    // 2 byte pieces
    // doc 2: 'café': c covered 1, a covered 1, f 1 byte, é 2 bytes ->
    // 5 pieces / 3 bytes; '中文' -> 3+3 bytes = 6 pieces 6 bytes;
    // 'cd' trained -> 1 symbol. total pieces 5+6+1=12, bytes 9
    assert(got(0) == ((1L, 2L, 1L + 3L, 2L)), s"doc1: ${got(0)}")
    assert(got(1) == ((2L, 3L, 12L, 9L)), s"doc2: ${got(1)}")
    // doc 3: 'a' covered (1) + emoji uncovered (4 bytes) = 5 pieces
    assert(got(2) == ((3L, 1L, 5L, 4L)), s"doc3: ${got(2)}")
  }

  test("bpeEncodeBytes on a fully covered corpus reports zero bytes") {
    val d = Seq((1L, "abab cd abab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeBytes(d, "text", d, "doc_id", "text",
      nMerges = 2).head()
    assert(r.getLong(3) == 0L, s"byte pieces on covered corpus: $r")
  }

  test("wordpieceEncodeBytes: uncovered words become UTF-8 bytes, " +
      "covered words match the [UNK] encoder piece-for-piece") {
    val train = Seq("abab abab cd cd").toDF("text")
    val vocab = TextAnalysis.wordpieceVocab(train, "text", nMerges = 3)
    val docs = Seq((1L, "abab axé cd")).toDF("doc_id", "text")
    val unk = TextAnalysis.wordpieceEncodeCounts(docs, "doc_id",
      "text", vocab, maxPieceLen = 8).head()
    val byt = TextAnalysis.wordpieceEncodeBytes(docs, "doc_id",
      "text", vocab, maxPieceLen = 8).head()
    // 'axé': a covered, x uncovered -> walk fails -> whole word to
    // bytes: a(1) + x(1) + é(2) = 4 byte pieces
    assert(unk.getLong(3) == 1L, s"unk law: $unk")
    assert(byt.getLong(3) == 4L, s"byte law: $byt")
    // covered words contribute identical piece counts in both laws:
    // total(bytes) - bytePieces == total(unk) - unkWordPieces(=1 each)
    assert(byt.getLong(2) - byt.getLong(3) ==
      unk.getLong(2) - unk.getLong(3), s"covered drift: $unk vs $byt")
  }

  test("unigramEncodeBytes mixes optimally: covered sub-spans use " +
      "vocab pieces, only unseen chars pay byte costs") {
    val train = Seq("abab abab ab").toDF("text")
    val docs = Seq((1L, "abé ab")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramEncodeBytes(train, "text", docs,
      "doc_id", "text", maxPieceLen = 2, seedSize = 4, vocabSize = 2,
      nRounds = 1).head()
    // 'abé': the DP picks [ab][é-bytes] = 1 + 2 = 3 pieces (2 byte
    // pieces) — NOT the 4-piece whole-word decomposition; 'ab' = 1.
    assert(r.getLong(1) == 2L, s"n_words: $r")
    assert(r.getLong(2) == 4L, s"n_pieces (3 + 1): $r")
    assert(r.getLong(3) == 2L, s"byte pieces: $r")
  }

  // ---- full Leiden ----

  private def leidenFixture = {
    // two 4-cliques bridged, plus a 6-ring: enough structure for the
    // move phase to form communities and the refinement to bind
    val k4a = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val k4b = for (i <- 10 to 13; j <- (i + 1) to 13)
      yield (i.toLong, j.toLong)
    val ring = (0 to 5).map(i => (20L + i, 20L + (i + 1) % 6))
    (k4a ++ k4b ++ Seq((3L, 10L)) ++ ring).toDF("a", "b")
  }

  test("leidenFull reaches at least plain Louvain's final modularity " +
      "and emits strictly increasing Q") {
    val full = GraphAnalytics.leidenFull(leidenFixture, maxLevels = 3,
      roundsPerLevel = 4, mergeSweeps = 2)
      .select("level", "q_num", "q_den").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val plain = GraphAnalytics.louvainLevels(leidenFixture,
      maxLevels = 3, roundsPerLevel = 4)
      .select("level", "q_num", "q_den").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(full.nonEmpty && plain.nonEmpty)
    assert(full.map(_._3).distinct.size == 1, "q_den varies")
    // strictly increasing Q across emitted levels (the stop law)
    assert(full.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a < b
      case _ => true
    }, s"Q not increasing: ${full.toSeq}")
    assert(full.last._2 >= plain.last._2,
      s"full Leiden Q ${full.last} < plain Louvain ${plain.last}")
  }

  test("leidenFull BEATS plain Louvain on the gate fixture (the " +
      "guarantee-3 seeding binding at realistic structure)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val v1 = col("l_orderkey") % 300
    val head = v1 - (v1 % 5)
    val intra = li.select(v1.as("a"), (head + col("l_partkey") % 5).as("b"))
    val ring = li.select(head.as("a"), ((head + 5) % 300).as("b"))
    val g = col("l_orderkey") % 60
    val chain = li.select((g + 1000).as("a"), (g + 1200).as("b"))
      .unionByName(li.select((g + 1100).as("a"), (g + 1200).as("b")))
    val pull = li.select((g + 1200).as("a"),
      (g * 5 + col("l_partkey") % 3).as("b"))
    val fx = intra.unionByName(ring).unionByName(chain).unionByName(pull)
    def finalQ(df: org.apache.spark.sql.DataFrame): Long =
      df.select("level", "q_num").distinct()
        .orderBy(col("level").desc).head().getLong(1)
    val qFull = finalQ(GraphAnalytics.leidenFull(fx, 3, 4, 2))
    val qLouv = finalQ(GraphAnalytics.louvainLevels(fx, 3, 4))
    assert(qFull > qLouv, s"full $qFull !> louvain $qLouv")
  }

  test("leidenFull on an empty graph returns the empty partition") {
    val e = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphAnalytics.leidenFull(e, 2, 2).isEmpty)
  }

  test("leidenFull partitions every vertex exactly once per level") {
    val out = GraphAnalytics.leidenFull(leidenFixture, maxLevels = 2,
      roundsPerLevel = 3, mergeSweeps = 2)
    val perLevel = out.groupBy("level")
      .agg(count(lit(1)).as("n"), countDistinct(col("_vid")).as("nv"))
      .collect()
    val nVerts = leidenFixture.select(col("a").as("x"))
      .union(leidenFixture.select(col("b"))).distinct().count()
    perLevel.foreach { r =>
      assert(r.getLong(1) == nVerts && r.getLong(2) == nVerts,
        s"level ${r.getLong(0)}: $r vs $nVerts vertices")
    }
  }

  test("graphAnnIvfTopK walks from the query's nearest cell seeds " +
      "and finds a neighbor fixed far entries would need more rounds " +
      "for") {
    // line of 12 vectors along one axis with slight off-axis noise:
    // cells = ids < 4, query 0 sits at the start; its nearest seeds
    // are 1,2 — one beam round over the chain graph reaches 1's
    // neighbors. A ring adjacency (i -> i±1) keeps the walk honest.
    val emb = (0 to 11).map { i =>
      (i.toLong, Array.tabulate(4)(d =>
        if (d == 0) 1.0f else i.toFloat / (10f + d)))
    }.toDF("vec_id", "embedding")
    val edges = (0 to 11).flatMap(i =>
      Seq((i.toLong, ((i + 1) % 12).toLong),
        (i.toLong, ((i + 11) % 12).toLong))).toDF("a", "b")
    val out = Similarity.graphAnnIvfTopK(emb, "vec_id", "embedding",
      edges, queryIds = Seq(0L), nCells = 4, nProbe = 2,
      beam = 4, rounds = 3, k = 3)
    val rows = out.orderBy("rk").collect()
    assert(rows.length == 3, s"got ${rows.toSeq}")
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L),
      s"rank law: ${rows.toSeq}")
    assert(!rows.map(_.getLong(1)).contains(0L), "self excluded")
  }

  // ---- louvainMoveWeighted pre-hoist equivalence ----

  test("louvainMoveWeighted with precomputed strengths equals the " +
      "self-computed path") {
    val g = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 4L, 2L), (1L, 1L, 5L),
      (4L, 5L, 1L)).toDF("u", "v", "w")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 4L), (4L, 4L), (5L, 4L))
      .toDF("x", "c")
    val verts = comm.select("x")
    val base = GraphAnalytics.louvainMoveWeighted(g, comm)
      .orderBy("_vid").collect().toSeq
    val strengths = {
      // replicate the public contract: k = both-endpoint non-self + 2x self
      val nonSelf = g.filter(col("u") =!= col("v"))
      verts.join(nonSelf.select(col("u").as("x"), col("w"))
          .unionByName(nonSelf.select(col("v").as("x"), col("w")))
          .groupBy("x").agg(sum(col("w")).as("ka")), Seq("x"), "left")
        .join(g.filter(col("u") === col("v"))
          .groupBy(col("u").as("x")).agg((sum(col("w")) * 2).as("ks")),
          Seq("x"), "left")
        .select(col("x"), (coalesce(col("ka"), lit(0L)) +
          coalesce(col("ks"), lit(0L))).as("k"))
    }
    val m2v = strengths.agg(sum(col("k"))).head().getLong(0)
    val pre = GraphAnalytics.louvainMoveWeighted(g, comm,
      persistInputs = false, pre = Some((strengths, m2v)))
      .orderBy("_vid").collect().toSeq
    assert(base == pre, s"pre-hoist diverged:\n$base\n$pre")
  }

  // ---- r13 ADVICE hardenings ----

  test("singleLinkageCuts returns an empty typed frame on empty input") {
    val e = Seq.empty[(Long, Long, Long)].toDF("a", "b", "simx")
    val out = Similarity.singleLinkageCuts(e, Seq(500000L), 4)
    assert(out.columns.toSeq ==
      Seq("threshold_x", "vec_id", "cluster"))
    assert(out.isEmpty)
  }

  test("singleLinkageCuts refuses negative vertex ids loudly") {
    val e = Seq((-1L, 2L, 900000L)).toDF("a", "b", "simx")
    val ex = intercept[Exception] {
      Similarity.singleLinkageCuts(e, Seq(500000L), 4).count()
    }
    assert(ex.getMessage.contains("2^40"), ex.getMessage)
  }

  test("pcaPower2 on a zero-variance corpus yields zero loadings, " +
      "never NaN") {
    val emb = (0 to 5).map(i => (i.toLong, Seq.fill(4)(2.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaPower2(emb, "vec_id", "embedding",
      dim = 4, iters = 2).collect()
    got.foreach { r =>
      assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN, s"NaN: $r")
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0, s"$r")
    }
  }
}
