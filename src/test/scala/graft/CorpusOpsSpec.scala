package graft

import graft.operators.{Sample, TextSearch}
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "cat dog cat bird", "en"),
    (2L, "dog dog dog dog", "en"),
    (3L, "cat fish", "fr"),
    (4L, "unique words only here", "fr"))
    .toDF("doc_id", "text", "lang")

  test("langConfusion: diagonal hits and a planted confusion cell") {
    val cd = Seq(
      (1L, "the value of the table", "en"),  // correct en
      (2L, "der und nicht das", "de"),       // correct de
      (3L, "le la les des est", "fr"),       // correct fr
      (4L, "der und nicht", "en"))           // labeled en, reads de
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.langConfusion(cd, "lang", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2))).toMap
    assert(m == Map(("en", "en") -> 1L, ("de", "de") -> 1L,
      ("fr", "fr") -> 1L, ("en", "de") -> 1L))
    CacheScope.drain(spark)
  }

  test("sourceQualityShrunk: small perfect source ranks below big one") {
    val good = ("the value of the table is it and to in " * 15).trim
    val bad = "::: !!! ,,,"
    val docs = ((1L to 1L).map(i => (i, good, "tiny")) ++
      (10L to 18L).map(i => (i, good, "big")) :+ ((19L, bad, "big")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceQualityShrunk(docs, "doc_id", "text",
        "source", threshold = 300L, alpha = 2L, beta = 2L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("tiny") == ((1L, 1L, 600L)))   // (1+2)*1000/(1+4)
    assert(got("big") == ((10L, 9L, 785L)))   // (9+2)*1000/(10+4)
    // raw rate would rank tiny (1000) over big (900); shrunk flips it
    assert(got("tiny")._3 < got("big")._3)
    CacheScope.drain(spark)
  }

  test("dsirSelect: max-score doc always kept, zero-score never") {
    val docs = Seq(
      (1L, "target target target", "src0"),  // pure target mass
      (2L, "offtopic words only here", "src1"),  // zero target overlap
      (3L, "target offtopic", "src1"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        isTarget = col("source") === "src0")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val smax = got.values.map(_._1).max
    assert(got(1L)._1 == smax && got(1L)._2 == 1) // P(keep)=1 at the max
    assert(got(2L)._1 == 0L && got(2L)._2 == 0)   // P(keep)=0 at zero
    CacheScope.drain(spark)
  }

  test("vocabGrowth: hand Heaps curve, new-type credit at first doc") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c d d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text",
        bucketSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc1: 3 tok, births a,b; doc2: 2 tok, birth c; doc3: 3 tok, birth d
    assert(got == Map(0L -> ((2L, 5L, 3L)), 1L -> ((3L, 8L, 4L))))
    CacheScope.drain(spark)
  }

  test("unigramDraws: interval ownership matches a scala replay") {
    val corpus = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // layout (tok asc): a [0,3), b [3,5), c [5,6); total 6
    val got = TextAnalysis.unigramDraws(corpus, "text", k = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size == 8)
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    (0L until 8L).foreach { i =>
      val t = h(s"7#$i") % 6
      val exp = if (t < 3) ("a", 3L) else if (t < 5) ("b", 2L)
      else ("c", 1L)
      assert(got(i) == exp, s"draw $i target $t")
    }
    CacheScope.drain(spark)
  }

  test("qualitySweep: one-pass retention curve") {
    val qd = Seq((1L, "a b c"), (2L, "a"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualitySweep(qd, "text", Seq(1, 3, 4))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2))))
      .toMap
    assert(r == Map(1L -> ((3L, 9L)), 3L -> ((2L, 8L)),
      4L -> ((1L, 5L))))
    CacheScope.drain(spark)
  }

  test("skipgramCounts: window pairs, boundary clipping, cutoff") {
    val sg = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.skipgramCounts(sg, "text", window = 1,
        minCount = 1)
      .collect().map(x => ((x.getString(0), x.getString(1)),
        x.getLong(2))).toMap
    // doc1: (a,b),(b,a),(b,c),(c,b); doc2: (a,b),(b,a)
    assert(r == Map(("a", "b") -> 2L, ("b", "a") -> 2L,
      ("b", "c") -> 1L, ("c", "b") -> 1L))
    // window 2 reaches across; minCount 2 prunes the singletons
    val r2 = TextAnalysis.skipgramCounts(sg, "text", window = 2,
        minCount = 2)
      .collect().map(x => ((x.getString(0), x.getString(1)),
        x.getLong(2))).toMap
    assert(r2 == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
    CacheScope.drain(spark)
  }

  test("phraseSearch: positions, overlapping matches, multi-phrase ids") {
    val pd = Seq(
      (1L, "a b c a b"), // "a b" at 0 and 3; "b c" at 1 but no "b c d"
      (2L, "a a a"),     // overlapping "a a" at 0 and 1
      (3L, "b c d"),
      (4L, "x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.phraseSearch(pd, "doc_id", "text",
      Seq(Seq("a", "b"), Seq("a", "a"), Seq("b", "c", "d")))
      .collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3)))).toMap
    assert(r((0L, 1L)) == ((2L, 0L))) // two "a b" hits, first at pos 0
    assert(r((1L, 2L)) == ((2L, 0L))) // overlaps both count
    assert(r((2L, 3L)) == ((1L, 0L))) // trigram
    assert(!r.contains((2L, 1L)))    // "b c" present but "b c d" absent
    assert(!r.keySet.exists(_._2 == 4L)) // no-match doc emits nothing
    CacheScope.drain(spark)
  }

  test("tfidfTopTerms scores and ranks with deterministic ties") {
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toList).toMap
    // doc 2: only term "dog" (df=2) -> 4 * ln(4/2)
    assert(out(2L) == List("dog" -> math.round(4 * math.log(2) * 1e6) / 1e6))
    // doc 1: cat tf=2 df=2 -> 2ln2 ; bird tf=1 df=1 -> ln4 ; dog tf=1 df=2 -> ln2
    // top2 = cat (1.386294) then bird (1.386294) — tie broken by term asc
    val d1 = out(1L)
    assert(d1.map(_._1) == List("bird", "cat") ||
      d1.map(_._1) == List("cat", "bird"))
    assert(d1.map(_._2).distinct == List(math.round(math.log(4) * 1e6) / 1e6))
  }

  test("zipfTable ranks by freq desc with token tie-break") {
    val got = TextAnalysis.zipfTable(docs, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // dog 5, cat 3, then six singletons ranked alphabetically
    assert(got("dog") == ((5L, 1L)) && got("cat") == ((3L, 2L)), s"$got")
    assert(got("bird") == ((1L, 3L)) && got("fish") == ((1L, 4L)), s"$got")
    assert(got.size == 8 && got.values.map(_._2).toSet == (1L to 8L).toSet)
  }

  test("repetitionStats flags repeated words and bigrams") {
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n2, dup2, topw2, topb2) = out(2L)
    assert(n2 == 4 && dup2 == 0.75 && topw2 == 1.0 && topb2 == 1.0)
    val (_, n4, dup4, topw4, _) = out(4L)
    assert(n4 == 4 && dup4 == 0.0 && topw4 == 0.25)
    val (_, _, _, _, topb1) = out(1L)
    assert(topb1 == math.round(1.0 / 3 * 1e6) / 1e6) // 3 distinct bigrams
  }

  test("vocabCoverage: cumulative top-K mass, hand-counted") {
    // freqs: dog 5, cat 3, six singletons (total 14)
    val out = TextAnalysis.vocabCoverage(docs, "text", ks = Seq(1, 2, 8))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("cum_freq"), r.getAs[Long]("n_total")))).toMap
    assert(out == Map(1L -> ((5L, 14L)), 2L -> ((8L, 14L)),
      8L -> ((14L, 14L))))
  }

  test("sourceVocabOverlap counts shared distinct tokens per pair") {
    val d = Seq(
      (1L, "cat dog", "a"), (2L, "dog fish", "a"),
      (3L, "dog bird", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceVocabOverlap(d, "source", "text")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[String]("src_a"), r.getAs[String]("src_b")) == ("a", "b"))
    assert(r.getAs[Long]("n_common") == 1L) // {dog}
    assert((r.getAs[Long]("v_a"), r.getAs[Long]("v_b")) == (3L, 2L))
  }

  test("dsirEvidence: hand-computed scaled likelihood-ratio sums") {
    val d = Seq(
      (1L, "x x y", "src0"),
      (2L, "y z", "src1"))
      .toDF("doc_id", "text", "source")
    // c_all: x=2 y=2 z=1; c_tgt: x=2 y=1 z=0; N_all=5, N_tgt=3
    // r(x) = ((2e6 div 2) * 5) div 3 = 1666666
    // r(y) = ((1e6 div 2) * 5) div 3 = 833333 ; r(z) = 0
    val out = TextAnalysis.dsirEvidence(d, "doc_id", "text",
        isTarget = col("source") === "src0")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("dsir_scaled")))).toMap
    assert(out(1L) == ((3L, 2L * 1666666L + 833333L)))
    assert(out(2L) == ((2L, 833333L)))
  }

  test("crossSourceDups: shared fingerprints counted per source pair") {
    val d = Seq(
      (1L, "dup text", "a"), (2L, "dup text", "b"), (3L, "dup text", "b"),
      (4L, "other dup", "a"), (5L, "other dup", "c"),
      (6L, "unique", "a"))
      .toDF("doc_id", "text", "source")
    val out = graft.pipeline.Curation
      .crossSourceDups(d, "text", "source")
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
        -> ((r.getAs[Long]("n_shared_fps"), r.getAs[Long]("n_dup_row_pairs"))))
      .toMap
    // "dup text": a×1, b×2 -> pair (a,b) 1 shared fp, 1*2 row pairs
    // "other dup": a×1, c×1 -> pair (a,c) 1 shared fp, 1 row pair
    assert(out == Map(("a", "b") -> ((1L, 2L)), ("a", "c") -> ((1L, 1L))))
  }

  test("dedupRateBySource charges losers to their own source") {
    val d = Seq(
      (1L, "same text", "a"), (2L, "same text", "b"),
      (3L, "unique", "a"), (4L, "same text", "a"))
      .toDF("doc_id", "text", "source")
    val out = graft.pipeline.Curation
      .dedupRateBySource(d, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"), r.getAs[Long]("n_in_dup_groups"))))
      .toMap
    assert(out("a") == ((3L, 2L, 1L, 2L))) // doc 4 lost to doc 1
    assert(out("b") == ((1L, 0L, 1L, 1L))) // doc 2 lost cross-source
  }

  test("stratified takes exactly k per stratum, deterministically") {
    val big = spark.range(1000).select(col("id"),
      (col("id") % 3).cast("string").as("lang"))
    val s1 = Sample.stratified(big, "lang", "id", 7)
      .as[(Long, String)].collect().toSet
    val s2 = Sample.stratified(big, "lang", "id", 7)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2)
    assert(s1.groupBy(_._2).values.forall(_.size == 7))
  }

  test("text search: prefix/wildcard/regexp/fuzzy semantics") {
    val d = Seq((1L, "the quick table", "alpha"),
      (2L, "a tabel typo here", "beta"),
      (3L, "nothing relevant", "alphabet"))
      .toDF("doc_id", "text", "source")
    assert(TextSearch.prefix(d, "source", "alpha")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(TextSearch.wildcard(d, "source", "%bet_")
      .select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(TextSearch.wildcard(d, "source", "%bet")
      .select("doc_id").as[Long].collect().toSet == Set(3L))
    assert(TextSearch.regexp(d, "text", "qu[io]ck")
      .select("doc_id").as[Long].collect().toSet == Set(1L))
    // plain Levenshtein: the "table"/"tabel" transposition is 2 edits
    assert(TextSearch.fuzzy(d, "text", "tabel", 1)
      .select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(TextSearch.fuzzy(d, "text", "tabel", 2)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("distinctiveTerms: lift ranks the group-exclusive token first") {
    import graft.pipeline.TextAnalysis
    // g1: "a a b", g2: "b b b a" -> T=7, a: 3 total, b: 4 total
    val d = Seq(("g1", "a a b"), ("g2", "b b b a"))
      .toDF("grp", "text")
    val out = TextAnalysis.distinctiveTerms(d, "grp", "text",
        minCount = 1, topK = 2)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // lift(g1,a) = 2·7·10^6 div (3·3) = 1555555; lift(g1,b) = 583333
    assert(out(("g1", "a")) == ((2L, 3L, 1555555L, 1L)))
    assert(out(("g1", "b")) == ((1L, 4L, 583333L, 2L)))
    // lift(g2,b) = 3·7·10^6 div (4·4) = 1312500; lift(g2,a) = 583333
    assert(out(("g2", "b")) == ((3L, 4L, 1312500L, 1L)))
    assert(out(("g2", "a")) == ((1L, 3L, 583333L, 2L)))
  }

  test("boilerplateStrip flags per-source high-df lines only") {
    import graft.pipeline.Curation
    // source s1: 3 docs sharing line "nav bar", each one unique line;
    // source s2: 1 doc ALSO containing "nav bar" (df=1 there -> kept)
    val d = Seq(
      (1L, "s1", Seq("nav bar", "alpha")),
      (2L, "s1", Seq("nav bar", "beta")),
      (3L, "s1", Seq("nav bar", "gamma")),
      (4L, "s2", Seq("nav bar", "delta")))
      .toDF("doc_id", "source", "lines")
    val out = Curation.boilerplateStrip(d, "doc_id", "source", "lines",
        minDocs = 2, thrPermille = 500)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out(1L) == ((2L, 1L, 1L))) // "nav bar" boiler in s1
    assert(out(2L) == ((2L, 1L, 1L)))
    assert(out(3L) == ((2L, 1L, 1L)))
    assert(out(4L) == ((2L, 0L, 2L))) // same line NOT boiler in s2
  }

  test("sourceConcentration: hand Gini/top-share/HHI") {
    import graft.pipeline.Curation
    // counts 1 and 3: G = (2·(1·1+2·3) − 3·4)/(2·4) = 2/8 = 0.25
    val d = (Seq.fill(1)("a") ++ Seq.fill(3)("b")).toDF("source")
    val r = Curation.sourceConcentration(d, "source")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((2L, 4L, 250000L, 750000L, 625000L)))
    // uniform counts -> Gini 0
    val u = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val r2 = Curation.sourceConcentration(u, "source")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r2._3 == 0L && r2._4 == 500000L && r2._5 == 500000L)
  }

  test("associationRules: capped baskets, consistent conf/lift") {
    import graft.analytics.GraphAnalytics
    // baskets: b1={x,y}, b2={x,y}, b3={x,z}, b4={y} (size-1: dropped)
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 20L)).toDF("basket", "item")
    val out = GraphAnalytics.associationRules(e, "basket", "item",
        maxPerBasket = 8, minCount = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // N=3 capped baskets; x in 3, y in 2; pair (x,y) in 2
    assert(out.keySet == Set((10L, 20L), (20L, 10L)))
    val xy = out((10L, 20L))
    assert(xy._3 == 2L && xy._4 == 3L && xy._5 == 2L && xy._6 == 3L)
    assert(xy._7 == 666L)      // conf = 2·1000 div 3
    assert(xy._8 == 1000000L)  // lift = 2·3·10^6 div (3·2)
    val yx = out((20L, 10L))
    assert(yx._7 == 1000L && yx._8 == 1000000L)
  }
}
