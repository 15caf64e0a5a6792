package graft

import graft.expr.FilterExpr
import graft.expr.FilterExpr._
import graft.model.GraphStore
import graft.operators._
import org.apache.spark.sql.functions._

/** NULL⇒false filter semantics (reference FilterNode.h:64-77). */
class FilterExprSpec extends SparkSpec {
  import spark.implicits._

  test("null predicate drops the row instead of leaking null") {
    val df = Seq((1L, Some(5)), (2L, None), (3L, Some(50))).toDF("id", "v")
    val pred = Cmp(">", Prop("v"), Lit(10))
    val kept = df.filter(FilterExpr.predicate(pred)).select("id")
      .as[Long].collect().toSet
    assert(kept == Set(3L)) // row 2 (null) must be dropped, not error
  }

  test("NOT over null stays false (no three-valued leak)") {
    val df = Seq((1L, Some(5)), (2L, None)).toDF("id", "v")
    // NOT(v > 10): SQL would keep the null row as UNKNOWN; the reference
    // drops any non-true evaluation.
    val pred = Not(Cmp(">", Prop("v"), Lit(10)))
    val kept = df.filter(FilterExpr.predicate(pred)).select("id")
      .as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("expression surface compiles: case/in/contains/regex/xor/cast") {
    val df = Seq(("abc", 5), ("xbz", 25)).toDF("s", "n")
    val e = And(
      Or(InList(Prop("s"), Seq("abc", "zzz")), RegexMatch(Prop("s"), "^xb")),
      Cmp("<", Cast("long", Prop("n")), Lit(100L)))
    assert(df.filter(FilterExpr.predicate(e)).count() == 2)
    val c = CaseWhen(Seq(Cmp("<", Prop("n"), Lit(10)) -> Lit("lo")), Some(Lit("hi")))
    val out = df.select(FilterExpr.compile(c).as("cls")).as[String].collect().toSet
    assert(out == Set("lo", "hi"))
  }
}

class GetNeighborsSpec extends SparkSpec {
  import GetNeighbors._

  lazy val store: GraphStore = GraphStore.cached(spark, sfDir)

  test("out/in duality: every out-edge appears as an in-edge") {
    val out = GetNeighbors.flat(store, Request(Seq("placed"), direction = Out))
    val in = GetNeighbors.flat(store, Request(Seq("placed"), direction = In))
    assert(out.count() == in.count())
    // the reversed pair sets must match
    val outPairs = out.select(col("_vid"), col("_nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inPairs = in.select(col("_nbr"), col("_vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outPairs == inPairs)
  }

  test("per-vertex limit bounds each group, in storage-key order") {
    val df = GetNeighbors.flat(store, Request(Seq("contains"),
      direction = Out, limitPerVertex = Some(3)))
    val counts = df.groupBy("_vid").count()
    assert(counts.agg(max("count")).head.getLong(0) <= 3)
    // kept edges must be the (type,rank,dst)-smallest of each group
    val all = GetNeighbors.flat(store, Request(Seq("contains"), direction = Out))
    val expectFirst = all.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("_vid").orderBy("_type", "_rank", "_nbr")))
      .filter(col("rn") <= 3).count()
    assert(df.count() == expectFirst)
  }

  test("both direction = out ∪ in with signed _type") {
    val req = Request(Seq("placed"), vertexIds = Some(Seq(1L, 2L, 3L)),
      direction = Both)
    val df = GetNeighbors.flat(store, req)
    val types = df.select("_type").distinct().collect().map(_.getInt(0)).toSet
    assert(types.subsetOf(Set(101, -101)))
  }

  test("stats match a manual aggregation") {
    val req = Request(Seq("placed"), direction = Out,
      edgeProps = Seq("o_totalprice"),
      stats = Seq(StatSpec("*", "count", "cnt"),
        StatSpec("o_totalprice", "sum", "s")))
    val got = GetNeighbors.stats(store, req)
    val manual = store.edge("placed").groupBy(col("_src").as("_vid"))
      .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("s"))
    assert(got.except(manual).isEmpty && manual.except(got).isEmpty)
  }

  test("grouped shape: _vid, _stats, _tag cells, ordered _edges array") {
    val df = GetNeighbors.grouped(store, Request(Seq("placed"),
      vertexIds = Some(Seq(1L, 2L)), direction = Out,
      edgeProps = Seq("o_totalprice"),
      tagProps = Map("customer" -> Seq("c_name", "c_acctbal")),
      limitPerVertex = Some(3),
      stats = Seq(StatSpec("*", "count", "cnt"),
        StatSpec("o_totalprice", "sum", "s"))))
    assert(df.count() <= 2)
    assert(df.schema("_edges").dataType.typeName == "array")
    assert(df.schema("_stats").dataType.typeName == "struct")
    assert(df.schema("_tag_customer").dataType.typeName == "struct")
    val r = df.filter(col("_vid") === 1L).head()
    // stats cover the FULL post-filter stream; _edges capped at 3
    val cnt = r.getAs[org.apache.spark.sql.Row]("_stats").getAs[Long]("cnt")
    val edges = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("_edges")
    assert(edges.size <= 3 && cnt >= edges.size)
  }
}

class LookupSpec extends SparkSpec {

  test("hint shape validation mirrors IndexScanNode") {
    // range not last
    assertThrows[IllegalArgumentException] {
      Lookup.validateHints(Seq(
        Lookup.Range("a", Some(1)), Lookup.Prefix("b", 2)))
    }
    // two ranges
    assertThrows[IllegalArgumentException] {
      Lookup.validateHints(Seq(
        Lookup.Range("a", Some(1)), Lookup.Range("b", Some(2))))
    }
    Lookup.validateHints(Seq(Lookup.Prefix("a", 1), Lookup.Range("b", Some(2))))
  }

  test("union of contexts dedups on key columns") {
    val part = GraphStore.table(spark, sfDir, "part")
    val req = Lookup.Request(
      contexts = Seq(
        Lookup.IndexQueryContext(Seq(Lookup.Prefix("p_size", 10))),
        Lookup.IndexQueryContext(Seq(Lookup.Prefix("p_size", 10)))),
      yieldCols = Seq("p_partkey"), dedupKeys = Seq("p_partkey"))
    val once = part.filter(col("p_size") === 10).count()
    assert(Lookup(part, req).count() == once)
  }
}

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")

  test("if_not_exists keeps first-seen; default mode last-writer-wins") {
    val incoming = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val keep = Mutations.addRows(base, incoming, Seq("k"), ifNotExists = true)
    assert(keep.filter($"k" === 2L).select("name").as[String].head() == "b")
    assert(keep.count() == 3)
    val over = Mutations.addRows(base, incoming, Seq("k"), ifNotExists = false)
    assert(over.filter($"k" === 2L).select("name").as[String].head() == "B")
  }

  test("ordered SET evaluation: later set sees earlier set's value") {
    // v = v + 1; name = concat(name, v)  — name must use the NEW v
    val out = Mutations.updateWhere(base, Cmp("==", Prop("k"), Lit(1L)),
      Seq("v" -> ($"v" + 1.0), "name" -> concat($"name", $"v".cast("int"))))
    val row = out.filter($"k" === 1L).select("name", "v").head()
    assert(row.getString(0) == "a11" && row.getDouble(1) == 11.0)
  }

  test("upsert: condition gates updates, insertable fills defaults") {
    val updates = Seq(1L, 9L).toDF("k")
    val out = Mutations.upsert(base, updates, Seq("k"),
      condition = Some(Cmp(">", Prop("v"), Lit(5.0))),
      sets = Seq("v" -> ($"v" + 1.0)),
      insertable = true,
      defaults = Map("name" -> lit("dflt"), "v" -> lit(0.0)))
    val r1 = out.filter($"k" === 1L).head()
    assert(r1.getAs[Double]("v") == 11.0 && !r1.getAs[Boolean]("_inserted"))
    val r9 = out.filter($"k" === 9L).head()
    assert(r9.getAs[Double]("v") == 1.0 && r9.getAs[Boolean]("_inserted"))
    assert(r9.getAs[String]("name") == "dflt")
    assert(out.count() == 3)
  }
}

class SampleScanTtlSpec extends SparkSpec {
  import spark.implicits._

  test("reservoir sample is exactly k, deterministic under a seed") {
    val df = (1L to 500L).toDF("v")
    val agg = Sample.reservoir(col("v"), k = 10, seed = 7L)
    val a = df.coalesce(1).agg(agg.as("s")).as[Seq[Long]].head()
    val b = df.coalesce(1).agg(agg.as("s")).as[Seq[Long]].head()
    assert(a.size == 10 && a == b && a.toSet.subsetOf((1L to 500L).toSet))
  }

  test("keyset pagination covers the table exactly once") {
    val cust = GraphStore.cached(spark, sfDir).tag("customer")
    val total = cust.count()
    var cursor: Option[Any] = None
    var seen = 0L
    var pages = 0
    var done = false
    while (!done && pages < 100) {
      val p = Scan.pageWithCursor(cust, GraphStore.VID, Seq("c_name"), 64, cursor)
      val n = p.rows.count()
      seen += n; pages += 1
      if (n == 0) done = true else cursor = p.nextCursor
    }
    assert(seen == total)
  }

  test("ttl visibility and purge agree") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))).toDF("id", "ts")
    val now = to_timestamp(lit("2024-01-10 00:00:00"))
    val vis = Ttl.visible(df, "ts", 86400L * 7, now)
    assert(vis.select("id").as[Long].collect().toSet == Set(2L))
  }

  test("weighted sample: exact k, replayable, heavy weights dominate") {
    val rows = (1L to 50L).map(i =>
      ("g", i, if (i == 17L) 1e12 else 0.001)) ++
      (51L to 60L).map(i => ("h", i, 1.0))
    val df = rows.toDF("grp", "id", "w")
    val a = Sample.weightedByGroup(df, "grp", "id", "w", k = 3)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val b = Sample.weightedByGroup(df, "grp", "id", "w", k = 3)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a == b, "A-ES draw must be replayable")
    assert(a.count(_._1 == "g") == 3 && a.count(_._1 == "h") == 3)
    // ln(u)/1e12 ~ -1e-11 beats ln(u)/0.001 ~ -1e4 for any u
    assert(a.contains(("g", 17L)), "dominant weight must be sampled")
  }
}

/** Driver smoke contract: entry() must return rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

/** FetchEdgeNode: point-get edge rows by full (src, rank, dst) key. */
class FetchEdgeSpec extends SparkSpec {
  test("fetch by full edge key returns exactly those edges") {
    val store = GraphStore.cached(spark, sfDir)
    val sample = store.edge("contains")
      .orderBy("_src", "_rank", "_dst").limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val fetched = GetProps.edges(store, "contains", sample.toSeq,
      props = Seq("l_quantity"))
    assert(fetched.count() == 3)
    val got = fetched.select("_src", "_rank", "_dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == sample.toSet)
  }
}

/** White-box HyperLogLog: portable registers + estimate quality. */
class HllSpec extends SparkSpec {
  import graft.operators.Stats

  test("hll estimate within 3 sigma of exact on 10k distincts (b=10)") {
    import spark.implicits._
    val df = spark.range(10000).select(col("id"))
    val est = Stats.hllEstimate(Stats.hllRegisters(df, "id", b = 10), 10)
    // m=1024 -> sigma ~ 1.04/sqrt(1024) ~ 3.25%; allow 3 sigma
    assert(math.abs(est - 10000) / 10000.0 < 0.10, s"est $est")
  }

  test("hll small-range linear counting is near-exact") {
    val df = spark.range(30).select(col("id"))
    val est = Stats.hllEstimate(Stats.hllRegisters(df, "id", b = 10), 10)
    assert(math.abs(est - 30) / 30.0 < 0.10, s"est $est")
  }

  test("hll registers merge by max (shard-parallel law)") {
    val all = spark.range(5000).select(col("id"))
    val a = Stats.hllRegisters(all.filter(col("id") < 2500), "id", b = 6)
    val b = Stats.hllRegisters(all.filter(col("id") >= 2500), "id", b = 6)
    val merged = a.unionByName(b).groupBy("reg")
      .agg(max(col("max_rho")).as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Stats.hllRegisters(all, "id", b = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("duplicates do not move the registers (distinct-ness)") {
    import spark.implicits._
    val once = Seq("a", "b", "c").toDF("v")
    val tripled = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    val r1 = Stats.hllRegisters(once, "v", b = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = Stats.hllRegisters(tripled, "v", b = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2)
  }
}

/** Cohort retention: first-week cohorts, offset cells, event sums. */
class CohortSpec extends SparkSpec {
  import graft.operators.Stats

  test("cohort cells count retained users and their events") {
    import spark.implicits._
    val wkUs = 604800000000L // one week of microseconds
    // u1 first week 0 (2 events), active week 1 (1 event);
    // u2 first week 1 (1 event) — distinct cohort
    val df = Seq((1L, 0L), (1L, 1000L), (1L, wkUs), (2L, wkUs + 5L))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = Stats.cohortRetention(df, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    CacheScope.drain(spark)
    assert(got == Map(
      (0L, 0L) -> ((1L, 2L)),   // cohort 0, offset 0: u1, 2 events
      (0L, 1L) -> ((1L, 1L)),   // cohort 0 retained into week 1
      (1L, 0L) -> ((1L, 1L))),  // cohort 1, offset 0: u2
      s"got $got")
  }
}

/** White-box Count-Min Sketch: never-underestimate + merge law. */
class CmsSpec extends SparkSpec {
  import graft.operators.Stats

  test("cms point estimates never underestimate; exact when roomy") {
    import spark.implicits._
    // 3 keys with known multiplicities, width 1024 >> 3 keys: with
    // overwhelming probability no register collides, so est == exact
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("v")
    val sk = Stats.cmsRegisters(df, "v", depth = 4, width = 1024)
    val keys = Seq("a", "b", "c", "zzz_absent").toDF("k")
    val est = Stats.cmsLookup(sk, keys, "k", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 5L, "b" -> 3L, "c" -> 1L,
      "zzz_absent" -> 0L), s"got $est")
  }

  test("cms heavy hitters: no true heavy key missed, est >= true") {
    import spark.implicits._
    // key frequencies 1..20; bar at 10 -> true heavies are 10..20
    val df = (1 to 20).flatMap(k => Seq.fill(k)(s"k$k")).toDF("v")
    val hh = Stats.cmsHeavyHitters(df, "v", depth = 4, width = 1024,
      minFreq = 10L).collect()
    val got = hh.map(r => r.getAs[String]("pkey") ->
      ((r.getAs[Long]("est_cnt"), r.getAs[Long]("true_cnt")))).toMap
    // CMS never underestimates, so every key with true_cnt >= bar is in
    val trueHeavy = (10 to 20).map(k => s"k$k").toSet
    assert(trueHeavy.subsetOf(got.keySet),
      s"missed heavy keys: ${trueHeavy -- got.keySet}")
    assert(got.values.forall { case (est, t) => est >= t })
  }

  test("cms overestimates under collision pressure, never under") {
    // 500 distinct keys into width 16: heavy collisions by design
    val df = spark.range(500).select(col("id"))
    val sk = Stats.cmsRegisters(df, "id", depth = 3, width = 16)
    val est = Stats.cmsLookup(sk, df, "id", depth = 3, width = 16)
      .collect().map(r => r.getLong(1))
    assert(est.forall(_ >= 1L), "an estimate fell below the true count")
    assert(est.exists(_ > 1L), "width 16 with 500 keys must collide")
  }

  test("cms registers merge by element-wise sum (shard-parallel law)") {
    val all = spark.range(2000).select(col("id"))
    val a = Stats.cmsRegisters(all.filter(col("id") < 1000), "id", 4, 64)
    val b = Stats.cmsRegisters(all.filter(col("id") >= 1000), "id", 4, 64)
    val merged = a.unionByName(b).groupBy("hrow", "reg")
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val whole = Stats.cmsRegisters(all, "id", 4, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged == whole)
  }
}

/** Grouped HLL: per-key registers agree with per-key filtering. */
class HllGroupSpec extends SparkSpec {
  import graft.operators.Stats

  test("per-group registers == single-frame registers of that group") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"), (2L, "c"))
      .toDF("g", "v")
    val grouped = Stats.hllRegistersBy(df, Seq("g"), "v", b = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (g <- Seq(1L, 2L)) {
      val solo = Stats.hllRegisters(df.filter(col("g") === g), "v", b = 4)
        .collect().map(r => (g, r.getLong(0)) -> r.getLong(1)).toMap
      assert(solo.forall { case (k, v) => grouped.get(k).contains(v) },
        s"group $g mismatch")
    }
  }
}

class BinQuantilesSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Stats

  test("binned quantile is within one bin width of the exact quantile") {
    val vals = (1L to 1000L).map(_.toDouble)
    val df = vals.toDF("v")
    val out = Stats.binQuantiles(df, "v", lo = 0L, width = 10L,
      nBins = 200, permille = Seq(250, 500, 750, 1000))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // exact p-quantile of 1..1000 at permille pm is ~pm; the bin's
    // lower edge must sit within one width below it
    Seq(250, 500, 750, 1000).foreach { pm =>
      val exact = pm.toDouble
      val edge = out(pm)
      assert(edge <= exact && exact <= edge + 10,
        s"pm=$pm edge=$edge exact=$exact")
    }
  }

  test("quantileAssign: quartile split of a uniform column is exact") {
    val df = (0L to 99L).map(_.toDouble).toDF("v")
    val out = Stats.quantileAssign(df, "v", lo = 0L, width = 1L,
        nBins = 100, permille = Seq(250, 500, 750))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // boundary bins 24/49/74; bucket = #boundaries strictly below xbin
    assert(out == Map(
      0L -> ((25L, 0L, 24L)), 1L -> ((25L, 25L, 49L)),
      2L -> ((25L, 50L, 74L)), 3L -> ((25L, 75L, 99L))))
    CacheScope.drain(spark)
  }

  test("bin counts merge by addition: split-and-merge equals whole") {
    val whole = (1L to 500L).map(i => (i % 97).toDouble).toDF("v")
    val out = Stats.binQuantiles(whole, "v", 0L, 5L, 20, Seq(500))
      .collect().head.getLong(2)
    // same data computed as union of two disjoint halves — identical
    // quantile because bin counts are additive (the merge law)
    val half = whole.filter($"v" < 48).unionAll(whole.filter($"v" >= 48))
    val out2 = Stats.binQuantiles(half.repartition(7), "v", 0L, 5L, 20,
      Seq(500)).collect().head.getLong(2)
    assert(out == out2)
    // out-of-range values clamp to the edge bins, never lost
    val clamped = Stats.binQuantiles(
      Seq(-100.0, 0.0, 1e9).toDF("v"), "v", 0L, 5L, 20, Seq(1000))
      .collect().head.getLong(1)
    assert(clamped == 19L)
  }

  test("jsonField promotes typed values, nulls malformed rows") {
    import graft.sources.TextFormats.jsonField
    val df = Seq("""{"k": 7}""", """{"k": "x"}""", "not json", null)
      .toDF("props")
      .select(jsonField(org.apache.spark.sql.functions.col("props"),
        "k", "long").as("k"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(7L), None, None, None))
  }
}
