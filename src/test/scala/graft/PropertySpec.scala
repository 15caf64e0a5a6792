package graft

import graft.model.GraphStore
import graft.operators.{GetNeighbors, Sample, Skew}
import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for codec-free invariants (SURVEY.md §5): dedup
  * idempotence, limit ≤ k, reservoir size, salted-agg equivalence.
  * (Deterministic seeded sampling — the scalatest/scalacheck bridge
  * artifact isn't in the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 5)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  val textGen: Gen[String] = Gen.listOfN(30,
    Gen.oneOf("the", "fox", "dog", "spark", "row", "scan", "fast", ""))
    .map(_.mkString(" "))

  test("pairStats moments are additive across any shard split") {
    import graft.operators.Stats
    forAll(Gen.listOfN(40, Gen.zip(Gen.chooseNum(-50L, 50L),
        Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 9L)))) { rows =>
      val df = rows.toDF("x", "y", "shard")
      def stats(d: org.apache.spark.sql.DataFrame) =
        Stats.pairStats(d.select(col("x"), col("y")), Seq("x", "y"))
          .as[(String, String, Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
      val whole = stats(df)
      val parts = (0L to 9L).map(s => stats(df.filter(col("shard") === s)))
      val merged = whole.keySet.map { k =>
        k -> parts.map(_.getOrElse(k, (0L, 0L, 0L, 0L)))
          .reduce((a, b) =>
            (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
      }.toMap
      assert(merged == whole) // the sums re-add exactly: shardable
      CacheScope.drain(spark)
    }
  }

  test("peakConcurrency matches a brute-force sweep and any layout") {
    import graft.streaming.EventStream
    forAll(Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L),
        Gen.chooseNum(0L, 10000L)))) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, sec), i) =>
        (i.toLong, u, new java.sql.Timestamp(1700000000000L + sec * 1000),
          "e")
      }
      val df = rows.toDF("event_id", "user_id", "ts", "event_type")
      val got = EventStream.peakConcurrency(df, gapMinutes = 30)
        .as[(Long, Long)].collect().toMap
      // scala oracle: sessionize per user (30-min gap), sweep +1/-1
      val sess = rows.groupBy(_._2).values.flatMap { es =>
        val ts = es.map(_._3.getTime).sorted
        ts.foldLeft(List.empty[(Long, Long)]) {
          case (acc, t) if acc.nonEmpty && t - acc.head._2 < 1800000L =>
            (acc.head._1, t) :: acc.tail
          case (acc, t) => (t, t) :: acc
        }
      }.toList
      val deltas = sess.flatMap { case (s, e) =>
        Seq((s, 1L), (e, -1L)) }
        .sortBy { case (t, d) => (t, -d) } // +1 before -1 on ties
      var cur = 0L
      val peaks = scala.collection.mutable.Map.empty[Long, Long]
      deltas.foreach { case (t, d) =>
        cur += d
        val hr = (t * 1000L) / 3600000000L
        peaks(hr) = math.max(peaks.getOrElse(hr, Long.MinValue), cur)
      }
      assert(got == peaks.toMap)
      // layout invariance (two-level prefix sum is deterministic)
      val got17 = EventStream.peakConcurrency(df.repartition(17),
        gapMinutes = 30).as[(Long, Long)].collect().toMap
      assert(got17 == got)
      CacheScope.drain(spark)
    }
  }

  test("containment dominates jaccard on every candidate pair") {
    // |A∩B|/min ≥ |A∩B|/|A∪B| always — checked on real corpus pairs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 4, threshold = 0.0)
      .select(col("id_a"), col("id_b"), col("containment"))
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 4, threshold = 0.0)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = cont.join(jac, Seq("id_a", "id_b")).collect()
    assert(joined.nonEmpty)
    // quantization (4 decimals, half-up) can nudge each side by <=1e-4
    assert(joined.forall(r =>
      r.getAs[Double]("containment") >= r.getAs[Double]("jaccard") - 2e-4))
    CacheScope.drain(spark)
  }

  test("funnel counts never increase along the steps") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val out = graft.streaming.EventStream.funnel(ev, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase", "error"))
      .collect().sortBy(_.getAs[Long]("step"))
      .map(_.getAs[Long]("n_users")).toSeq
    assert(out == out.sorted.reverse, s"not monotone: $out")
    CacheScope.drain(spark)
  }

  test("CMS heavy hitters: estimate dominates truth for any width") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    forAll(Gen.oneOf(64, 256, 1024)) { w =>
      val bad = graft.operators.Stats
        .cmsHeavyHitters(df, "l_suppkey", depth = 3, width = w,
          minFreq = 1L)
        .filter(col("est_cnt") < col("true_cnt")).count()
      assert(bad == 0L, s"width $w underestimated $bad keys")
      CacheScope.drain(spark)
    }
  }

  test("exact dedup is idempotent") {
    forAll(Gen.listOfN(20, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exact(df, "doc_id", "text")
      val twice = Dedup.exact(once, "doc_id", "text")
      assert(once.count() == twice.count())
    }
  }

  test("per-vertex limit never exceeds k") {
    val store = GraphStore.cached(spark, sfDir)
    forAll(Gen.choose(1, 7)) { k =>
      val df = GetNeighbors.flat(store, GetNeighbors.Request(
        Seq("contains"), limitPerVertex = Some(k)))
      val maxPer = df.groupBy("_vid").count().agg(max("count"))
        .head.getLong(0)
      assert(maxPer <= k)
    }
  }

  test("reservoir size = min(k, n) for any k") {
    forAll(Gen.choose(1, 50), Gen.choose(1, 100)) { (k, n) =>
      val df = (1L to n.toLong).toDF("v").coalesce(1)
      val got = df.agg(Sample.reservoir(col("v"), k).as("s"))
        .as[Seq[Long]].head()
      assert(got.size == math.min(k, n))
      assert(got.distinct.size == got.size)
    }
  }

  test("reservoir is partition-count-invariant (k-way min-merge)") {
    forAll(Gen.choose(1, 25)) { k =>
      val df = (1L to 300L).toDF("v")
      def sample(parts: Int): Seq[Long] =
        df.repartition(parts).agg(Sample.reservoir(col("v"), k).as("s"))
          .as[Seq[Long]].head()
      val one = sample(1)
      assert(one == sample(17) && one == sample(5))
      assert(one.size == k)
    }
  }

  test("salted aggregation equals plain aggregation for any salt factor") {
    val store = GraphStore.cached(spark, sfDir)
    val edges = store.edge("placed")
    forAll(Gen.choose(2, 16)) { saltFactor =>
      val salted = Skew.saltedAgg(edges, GraphStore.SRC, GraphStore.DST,
        saltFactor, Seq(
          Skew.Agg("*", "count", "cnt"),
          Skew.Agg("o_totalprice", "sum", "s"),
          Skew.Agg("o_totalprice", "min", "mn"),
          Skew.Agg("o_totalprice", "max", "mx")))
      val plain = edges.groupBy(col(GraphStore.SRC)).agg(
        count(lit(1)).as("cnt"), sum("o_totalprice").as("s"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      // double sums regroup across the two stages -> compare rounded
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("s", round(col("s"), 2))
      assert(norm(salted).except(norm(plain)).isEmpty &&
        norm(plain).except(norm(salted)).isEmpty)
    }
  }

  test("token count is invariant under extra whitespace") {
    forAll(textGen) { t =>
      val padded = "  " + t.replace(" ", "   ") + " "
      val df = Seq(t, padded).toDF("text")
      val counts = df.select(TextAnalysis.tokenCount(col("text")))
        .as[Int].collect()
      assert(counts(0) == counts(1))
    }
  }

  test("int8 quantization error never exceeds half a step") {
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    forAll(Gen.listOfN(10, vecGen)) { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val bad = graft.pipeline.Similarity.quantizeInt8(df, "vec_id", "embedding")
        .filter(col("max_err") > col("scale") / 2 + 1e-9).count()
      assert(bad == 0)
    }
  }

  test("line dedup: no line text survives twice across the corpus") {
    val lineGen = Gen.listOfN(4,
      Gen.oneOf("a b", "c d", "e f", "g h", "i j"))
    forAll(Gen.listOfN(8, lineGen)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls) }.toDF("doc_id", "lines")
      val out = graft.pipeline.Curation.lineDedup(df, "doc_id", "lines")
      // reconstructed corpus keeps each distinct line exactly once =>
      // total kept lines == distinct lines in the input
      val keptTotal = out.agg(sum("n_lines_kept")).head.getLong(0)
      val distinctIn = docs.flatten.distinct.size.toLong
      assert(keptTotal == distinctIn)
    }
  }

  test("dupSpans: spans are disjoint, ordered, in-bounds, >= k long") {
    forAll(Gen.listOfN(12, textGen), n = 3) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nTok = df.select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("n")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val k = 3
      val spans = Dedup.dupSpans(df, "doc_id", "text", k).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
        .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).sorted)
      spans.foreach { case (id, ss) =>
        ss.foreach { case (a, b) =>
          assert(a >= 1 && b <= nTok(id), s"doc $id span [$a,$b] oob")
          assert(b - a + 1 >= k, s"doc $id span [$a,$b] shorter than k")
        }
        ss.toList.sliding(2).foreach {
          case List((_, b1), (a2, _)) =>
            assert(a2 > b1, s"doc $id spans overlap: ${ss.toList}")
          case _ =>
        }
      }
      CacheScope.drain(spark)
    }
  }

  test("sequencePack: offsets in range, per-shard stream is gapless") {
    forAll(Gen.listOfN(15, textGen), n = 3) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val target = 7
      val out = graft.pipeline.Curation
        .sequencePack(df, "doc_id", "text", target, nShards = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      out.foreach { case (_, _, nTok, start, seqId, off) =>
        assert(off >= 0 && off < target)
        assert(seqId == start / target && off == start % target)
        assert(nTok >= 0)
      }
      // gapless: within a shard, each doc starts where the previous
      // ended — the packed stream has no holes and no overlaps
      out.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.foldLeft(0L) { case (expectStart, (_, _, nTok, start, _, _)) =>
          assert(start == expectStart, s"hole in packed stream at $start")
          expectStart + nTok
        }
      }
    }
  }

  test("bloomDedupNew output equals the plain exact anti-join") {
    forAll(Gen.listOfN(24, textGen), n = 3) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val stored = df.filter(col("doc_id") < 16)
      val incoming = df.filter(col("doc_id") >= 8)
      val got = Dedup.bloomDedupNew(stored, incoming, "doc_id", "text",
          expectedItems = 100L, numBits = 4096L)
        .select("doc_id").as[Long].collect().toSet
      val fp = TextAnalysis.fingerprint(col("text"))
      val want = incoming.select(col("doc_id"), fp.as("f"))
        .join(stored.select(fp.as("f")).distinct(), Seq("f"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(got == want)
      CacheScope.drain(spark)
    }
  }

  test("weighted sample: exactly min(k, group size) rows per group") {
    forAll(Gen.choose(1, 8), Gen.choose(1, 30)) { (k, n) =>
      val df = (1L to n.toLong).map(i => (s"g${i % 3}", i, i.toDouble))
        .toDF("grp", "id", "w")
      val got = Sample.weightedByGroup(df, "grp", "id", "w", k)
        .groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizes = (1L to n.toLong).groupBy(i => s"g${i % 3}")
        .map { case (g, xs) => g -> xs.size.toLong }
      sizes.foreach { case (g, sz) =>
        assert(got(g) == math.min(k.toLong, sz)) }
    }
  }

  test("zValue/zDecode roundtrip on random coordinates and geometries") {
    import graft.sources.ZOrderLayout
    forAll(Gen.zip(Gen.choose(2, 3), Gen.choose(4, 10))) { case (nc, bits) =>
      val max = (1L << bits) - 1
      val rows = (1 to 40).map { i =>
        Seq.tabulate(nc)(j => (i * 2654435761L + j * 40503L) % (max + 1))
      }
      val df = rows.map(r => (r.head, r(1), if (nc > 2) r(2) else 0L))
        .toDF("c0", "c1", "c2")
      val cols = (0 until nc).map(j => org.apache.spark.sql.functions.col(s"c$j"))
      val z = df.withColumn("z", ZOrderLayout.zValue(cols, bits))
      (0 until nc).foreach { j =>
        val back = z.withColumn("back",
          ZOrderLayout.zDecode(org.apache.spark.sql.functions.col("z"),
            nc, bits, j))
        assert(back.filter(org.apache.spark.sql.functions
          .col(s"c$j") =!= org.apache.spark.sql.functions.col("back"))
          .count() == 0, s"roundtrip failed at nc=$nc bits=$bits j=$j")
      }
    }
  }

  test("binned quantile edge is never above the exact quantile and " +
      "within one width below it") {
    import graft.operators.Stats
    forAll(Gen.zip(Gen.choose(1, 20), Gen.choose(50, 400))) { case (w, n) =>
      val vals = (1 to n).map(i => ((i * 7919) % 997).toDouble)
      val df = vals.toDF("v")
      val got = Stats.binQuantiles(df, "v", 0L, w.toLong, 1000 / w + 1,
        Seq(500)).collect().head.getLong(2)
      val sorted = vals.sorted
      val exact = sorted((n * 500 + 999) / 1000 - 1) // ceil(p*n) element
      assert(got <= exact && exact < got + w,
        s"w=$w n=$n edge=$got exact=$exact")
    }
  }

  test("ppmi is symmetric when the window is symmetric") {
    forAll(Gen.listOfN(8, textGen), n = 3) { texts =>
      val ppmi = TextAnalysis.ppmi(texts.toDF("text"), "text",
        window = 2, minCount = 1)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(5))).toMap
      for (((w, c), (cnt, v)) <- ppmi) {
        assert(ppmi.contains((c, w)), s"missing mirror of ($w,$c)")
        val (mc, mv) = ppmi((c, w))
        assert(mc == cnt && math.abs(mv - v) < 1e-12,
          s"asymmetric PPMI for ($w,$c)")
      }
    }
  }

  test("bloom index never rejects a member (randomized sets)") {
    val keysGen = Gen.listOfN(60, Gen.chooseNum(0L, 5000L))
    forAll(keysGen, n = 4) { keys =>
      val data = keys.toDF("key")
        .select((col("key") % 4).as("bkt"), col("key"))
      val idx = graft.operators.BloomIndex.build(data, "bkt", "key",
        bits = 128, hashes = 2)
      val missed = graft.operators.BloomIndex.probe(idx,
        data.distinct(), data, "bkt", "key", bits = 128, hashes = 2)
        .agg(sum("missed")).head().getLong(0)
      assert(missed == 0L)
    }
  }

  test("histogramMatch: identical source and reference accepts " +
      "everything; acceptance respects the per-mille rule") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val self = graft.pipeline.Curation.histogramMatch(docs, docs,
      "doc_id", "n_chars", binWidth = 100L).collect()
    assert(self.forall(_.getLong(3) == 1000L), "p must be 1000 everywhere")
    assert(self.forall(r => r.getLong(4) == r.getLong(1)),
      "every source row accepted when distributions already match")
    val en = graft.pipeline.Curation.histogramMatch(docs,
      docs.filter(col("lang") === "en"), "doc_id", "n_chars", 100L)
      .collect()
    assert(en.forall(r => r.getLong(4) <= r.getLong(1)))
    assert(en.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000L))
  }
}
