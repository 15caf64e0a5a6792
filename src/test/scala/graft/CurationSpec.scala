package graft

import graft.functions.TimeOfDay
import graft.model.GraphStore
import graft.operators.Mutations
import graft.pipeline.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = GraphStore.table(spark, sfDir, "documents")

  test("cascadeDelete: transitive FK counts, untouched siblings kept") {
    // users 1,2; u1 has orders 10,11; u2 has order 20; order 10 has
    // items 100,101; order 20 has item 200. Delete u1 -> orders 10,11
    // -> items 100,101. u2's subtree survives.
    val users = Seq(1L, 2L).toDF("uid")
    val orders = Seq((10L, 1L), (11L, 1L), (20L, 2L)).toDF("oid", "uid")
    val items = Seq((100L, 10L), (101L, 10L), (200L, 20L))
      .toDF("iid", "oid")
    val rep = Mutations.cascadeDelete(
        Seq(("users", users, "uid", "uid"),
          ("orders", orders, "oid", "uid"),
          ("items", items, "iid", "oid")),
        victims = Seq(1L).toDF("uid"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == Map(
      "users" -> ((2L, 1L, 1L)),
      "orders" -> ((3L, 2L, 1L)),
      "items" -> ((3L, 2L, 1L))))
    CacheScope.drain(spark)
  }

  test("deleteTags removes only the targeted tag's rows") {
    val store = GraphStore.cached(spark, sfDir)
    val tags = Map("customer" -> store.tag("customer"),
      "order" -> store.tag("order"))
    val del = store.tag("customer").filter($"_vid" <= 10).select("_vid")
    val after = Mutations.deleteTags(tags, "_vid", del, Set("customer"))
    assert(after("customer").filter($"_vid" <= 10).count() == 0)
    assert(after("customer").count() == tags("customer").count() - del.count())
    // the other tag of the same vid universe is untouched
    assert(after("order").count() == tags("order").count())
  }

  test("decontaminate flags exactly the docs sharing >= minShared ngrams") {
    val bench = docs.filter($"doc_id" % 29 === 0)
    val corpus = docs.filter($"doc_id" % 29 =!= 0)
      // plant an exact copy of a benchmark doc under a fresh id
      .unionByName(bench.limit(1).select(
        lit(900001L).as("doc_id"), $"text", $"lang", $"source", $"n_chars"))
    val out = Curation.decontaminate(corpus, bench, "doc_id", "text",
      n = 4, minShared = 3).cache()
    val planted = out.filter($"doc_id" === 900001L).collect()
    assert(planted.length == 1, "planted copy must be flagged")
    // every flagged doc really shares >= 3 distinct 4-grams
    assert(out.agg(min($"shared_ngrams")).head.getLong(0) >= 3L)
    out.unpersist()
  }

  test("dupClusters: every cluster's canonical is its longest member") {
    val out = Curation.dupClusters(docs, "doc_id", "text",
      n = 4, numHashes = 8, bands = 4, threshold = 0.5).cache()
    assert(out.count() > 0)
    val lens = docs.select($"doc_id", length($"text").as("len"))
    val joined = out.join(lens, "doc_id")
    val canonLen = out.select($"canonical".as("doc_id"), $"cluster")
      .distinct().join(lens, "doc_id")
      .select($"cluster", $"len".as("canon_len"))
    // no member is longer than its cluster's canonical
    val viol = joined.join(canonLen, "cluster")
      .filter($"len" > $"canon_len").count()
    assert(viol == 0)
    // cluster label is the min doc_id of the cluster (GraphX CC law)
    val badLabel = out.groupBy("cluster").agg(min("doc_id").as("mn"))
      .filter($"cluster" =!= $"mn").count()
    assert(badLabel == 0)
    out.unpersist()
    CacheScope.drain(spark)
  }

  test("lineDedup keeps each line's global first occurrence only") {
    val in = Seq(
      (1L, Seq("alpha beta", "gamma delta")),
      (2L, Seq("gamma delta", "epsilon zeta")), // first line is doc 1's
      (3L, Seq("alpha beta"))                   // fully duplicated
    ).toDF("doc_id", "lines")
    val out = Curation.lineDedup(in, "doc_id", "lines")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (("alpha beta gamma delta", 2L)))
    assert(out(2L) == (("epsilon zeta", 1L)))
    assert(!out.contains(3L), "doc of only-duplicate lines must vanish")
  }

  test("chunkLines windows tokens in order, last chunk ragged") {
    val in = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val lines = in.select(
        Curation.chunkLines(pipeline.TextAnalysis.tokens($"text"), 4)
          .as("lines"))
      .head.getSeq[String](0)
    assert(lines == Seq("a b c d", "e f g h", "i"))
  }

  test("chunkWindows: overlap, clipped tail, full coverage") {
    // 10 tokens, size 4, stride 3 -> starts 1,4,7 cover [1,4][4,7][7,10]
    val in = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"),   // shorter than one window -> single clipped chunk
      (3L, ""))      // empty -> no chunks
      .toDF("doc_id", "text")
    val got = Curation.chunkWindows(in, "doc_id", "text",
        size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got.keySet.map(_._1) == Set(1L, 2L))
    assert(got((1L, 1L)) == ((1L, 4L, "t1 t2 t3 t4")))
    assert(got((1L, 2L)) == ((4L, 4L, "t4 t5 t6 t7")))
    assert(got((1L, 3L)) == ((7L, 4L, "t7 t8 t9 t10")))
    assert(got((2L, 1L)) == ((1L, 2L, "a b")))
    // every token position is covered by at least one chunk
    val covered = got.collect { case ((1L, _), (s, n, _)) =>
      (s to s + n - 1) }.flatten.toSet
    assert(covered == (1L to 10L).toSet)
  }

  test("piiScrub redacts emails and phones, counts match") {
    val in = Seq(
      (1L, "mail me at a.b+c@x-mail.example.org today"),
      (2L, "call +1-555-0199 or +1-555-0200"),
      (3L, "no pii here")).toDF("doc_id", "text")
    val out = Curation.piiScrub(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L)._1 == "mail me at <EMAIL> today")
    assert(out(1L)._2 == 1 && out(1L)._3 == 0)
    assert(out(2L)._1 == "call <PHONE> or <PHONE>")
    assert(out(2L)._3 == 2)
    assert(out(3L) == ("no pii here", 0, 0))
  }

  test("unigramLogProb: common-word docs outscore rare-word docs") {
    val in = Seq(
      (1L, "the the the the"),   // only the corpus's most common token
      (2L, "zyx the the the")    // one rare token drags the mean down
    ).toDF("doc_id", "text")
    val out = pipeline.TextAnalysis.unigramLogProb(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L)._1 == 4L && out(2L)._1 == 4L)
    // exact surrogate: doc 1 = 4 tokens × tf(the)=7; doc 2 = 1 + 3×7
    assert(out(1L)._2 == 28L && out(2L)._2 == 22L)
    // P(the)=7/8, P(zyx)=1/8: doc 1 mean = log2(7/8), doc 2 lower
    assert(math.abs(out(1L)._3 - math.log(7.0 / 8) / math.log(2)) < 1e-3)
    assert(out(2L)._3 < out(1L)._3)
    CacheScope.drain(spark)
  }

  test("tokenEntropy: uniform text hits log2(n), repeated text hits 0") {
    val in = Seq(
      (1L, "a b c d"),      // 4 distinct: H = 2 bits, ttr = 1
      (2L, "x x x x")       // 1 type:     H = 0,      ttr = 0.25
    ).toDF("doc_id", "text")
    val out = Curation.tokenEntropy(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out(1L) == ((4L, 4L, 4L, 2.0, 1.0)))   // Σc² = 4×1²
    assert(out(2L) == ((4L, 1L, 16L, 0.0, 0.25))) // Σc² = 4²
  }

  test("sequencePack: concat-then-chunk indices are exact per shard") {
    // one shard (nShards=1) so the packing math is hand-checkable
    val in = Seq(
      (0L, "a b c"),       // 3 toks, start 0  -> seq 0, off 0
      (1L, "d e f g"),     // 4 toks, start 3  -> seq 0, off 3
      (2L, "h i"),         // 2 toks, start 7  -> seq 1, off 2 (straddle)
      (3L, "j"))           // 1 tok,  start 9  -> seq 1, off 4
      .toDF("doc_id", "text")
    val out = Curation.sequencePack(in, "doc_id", "text",
      targetTokens = 5, nShards = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(0L) == ((3L, 0L, 0L, 0L)))
    assert(out(1L) == ((4L, 3L, 0L, 3L)))
    assert(out(2L) == ((2L, 7L, 1L, 2L)))
    assert(out(3L) == ((1L, 9L, 1L, 4L)))
    // sharded: per-shard streams are independent (doc 0,2 vs 1,3)
    val sh = Curation.sequencePack(in, "doc_id", "text",
      targetTokens = 5, nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sh(0L) == 0L && sh(2L) == 3L) // shard 0: doc0(3) then doc2
    assert(sh(1L) == 0L && sh(3L) == 4L) // shard 1: doc1(4) then doc3
  }

  test("mixtureSample: exact epoch counts, deterministic fractions") {
    val in = (0L to 19L).map(i =>
      (i, s"s${i % 4}")).toDF("doc_id", "source")
    val w = Map("s0" -> 0.0, "s1" -> 0.5, "s2" -> 2.0, "s3" -> 2.5)
    val out = Curation.mixtureSample(in, "doc_id", "source", w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    def hash(id: Long) = (id * 2654435761L) % 4294967296L
    for (id <- 0L to 19L) {
      val src = s"s${id % 4}"
      val expectN = math.floor(w(src)).toLong +
        (if (hash(id) <
          math.floor((w(src) - math.floor(w(src))) * 4294967296.0).toLong)
          1L else 0L)
      val got = out.getOrElse(id, Nil)
      assert(got == (1L to expectN).toList,
        s"doc $id ($src, w=${w(src)}): got $got want 1..$expectN")
    }
    // source absent from the map passes through once
    val thru = Curation.mixtureSample(
      Seq((99L, "unmapped")).toDF("doc_id", "source"),
      "doc_id", "source", w).count()
    assert(thru == 1L)
  }

  test("TIME type round-trips components and orders like the codec") {
    val in = Seq(
      (1L, 13, 5, 9, 123456),
      (2L, 0, 0, 0, 0),
      (3L, 23, 59, 59, 999999)).toDF("id", "h", "m", "s", "us")
    val enc = in.select($"id",
      TimeOfDay.makeTime($"h", $"m", $"s", $"us").as("t"))
    val back = enc.select($"id", TimeOfDay.hourOf($"t").as("h"),
        TimeOfDay.minuteOf($"t").as("m"), TimeOfDay.secondOf($"t").as("s"),
        TimeOfDay.microOf($"t").as("us"),
        TimeOfDay.formatTime($"t").as("str"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))
      .toMap
    assert(back(1L) == ((13, 5, 9, 123456, "13:05:09.123456")))
    assert(back(2L) == ((0, 0, 0, 0, "00:00:00.000000")))
    assert(back(3L) == ((23, 59, 59, 999999, "23:59:59.999999")))
    // long order == (h, m, s, us) lexicographic order
    val ts = enc.orderBy($"t").select("id").as[Long].collect().toSeq
    assert(ts == Seq(2L, 1L, 3L))
  }

  test("docNovelty: first doc fully novel, exact duplicate fully stale") {
    val in = Seq(
      (1L, "a b c d e f"),         // first owner of all its 4-grams
      (2L, "a b c d e f"),         // exact dup of 1 -> zero novelty
      (3L, "p q r s t u")          // disjoint -> fully novel
    ).toDF("doc_id", "text")
    val out = Curation.docNovelty(in, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 3L, 1000L)))
    assert(out(2L) == ((3L, 0L, 0L)))
    assert(out(3L) == ((3L, 3L, 1000L)))
  }

  test("batchPlan: bounded batches, dense deterministic addresses") {
    val out = Curation.batchPlan(docs, "doc_id", "text",
      bucketWidth = 8, batchSize = 4, numShards = 4).cache()
    // every doc addressed exactly once
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // positions dense in [0, batchSize) and batches never overfull
    assert(out.filter($"pos" < 0 || $"pos" >= 4).count() == 0)
    assert(out.groupBy("shard", "bucket", "batch_idx")
      .count().filter($"count" > 4).count() == 0)
    // only the LAST batch of a (shard,bucket) group may be partial
    val partial = out.groupBy("shard", "bucket", "batch_idx")
      .agg(count(lit(1)).as("n"), max($"batch_idx").as("bi"))
    val maxBi = out.groupBy("shard", "bucket")
      .agg(max($"batch_idx").as("last_bi"))
    assert(partial.join(maxBi, Seq("shard", "bucket"))
      .filter($"n" < 4 && $"batch_idx" =!= $"last_bi").count() == 0)
    out.unpersist()
  }

  test("tokenBudgetTrim: two-level prefix sum == one-window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val out = Curation.tokenBudgetTrim(docs, "doc_id", "text", "source",
      budget = 2000L, numBuckets = 16).cache()
    // kept set is exactly the prefix with cum <= B; drops start after
    assert(out.filter($"kept" === 1 && $"cum_tok" > 2000).count() == 0)
    assert(out.filter($"kept" === 0 && $"cum_tok" <= 2000).count() == 0)
    // engine decomposition equals the naive single-window formulation
    val bkt = pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
      16, 10).cast("long"), lit(16L))
    val naive = docs.select($"doc_id", $"source",
        size(graft.pipeline.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tok"), bkt.as("bkt"))
      .withColumn("cum_tok", sum($"n_tok").over(
        Window.partitionBy($"source").orderBy($"bkt", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"cum_tok")
    val mismatch = out.select($"doc_id", $"cum_tok".as("c1"))
      .join(naive.withColumnRenamed("cum_tok", "c2"), "doc_id")
      .filter($"c1" =!= $"c2")
    assert(mismatch.count() == 0)
    out.unpersist()
  }

  test("splitAssign: dup texts co-locate, thresholds carve permille") {
    val out = Curation.splitAssign(docs, "doc_id", "text", 100, 100)
      .cache()
    // identical fingerprints -> identical split (leakage-safe law)
    assert(out.groupBy("fingerprint")
      .agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count() == 0)
    // split is exactly the bucket threshold function
    assert(out.filter(
      ($"bucket" < 100 && $"split" =!= "test") ||
      ($"bucket" >= 100 && $"bucket" < 200 && $"split" =!= "val") ||
      ($"bucket" >= 200 && $"split" =!= "train")).count() == 0)
    assert(out.agg(min($"bucket"), max($"bucket")).head match {
      case r => r.getLong(0) >= 0L && r.getLong(1) <= 999L
    })
    out.unpersist()
  }
}
