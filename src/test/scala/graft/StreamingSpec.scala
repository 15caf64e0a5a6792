package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** The streaming surface: the same windowedAgg column program must run
  * under Structured Streaming (file source, watermark, complete mode)
  * and agree with its batch execution. */
class StreamingSpec extends SparkSpec {

  test("windowed agg: streaming run equals batch run") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val batch = EventStream.windowedAgg(events).collect()
      .map(_.toSeq).toSet

    // stream the same parquet through a file source (needs a directory)
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(schema)
      .parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val q = EventStream.windowedAggStreaming(streamed)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("window top-k: streamed counts + rank finisher equal batch") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val batch = EventStream.windowTopK(events, k = 3).collect()
      .map(_.toSeq).toSet
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-topk").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val q = EventStream.windowCounts(streamed.withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = EventStream
        .windowTopKFinish(spark.table("topk_counts"), k = 3)
        .collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch broadcast join") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val dim = graft.model.GraphStore.table(spark, sfDir, "customer")
    def cols(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "c_mktsegment")
    val batch = cols(EventStream.enrich(events, dim,
        "user_id", "c_custkey", Seq("c_name", "c_mktsegment")))
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-enrich").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    // stateless stream-static join: append mode, no watermark needed
    val q = cols(EventStream.enrich(streamed, dim,
        "user_id", "c_custkey", Seq("c_name", "c_mktsegment")))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("curation scorers run unchanged under streaming (stream == batch)") {
    // the stateless curation heads (quality classifier, lang id, PII
    // scrub) are pure narrow maps, so the SAME column program runs
    // under readStream in append mode with no watermark — the
    // streaming ingest-filter deployment shape
    val docsPath = s"$sfDir/documents.parquet"
    def score(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextAnalysis.qualityClassifier(
        df, "doc_id", "text", threshold = 300L)
    val batch = score(spark.read.parquet(docsPath))
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-curation").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(docsPath),
      java.nio.file.Paths.get(s"$streamDir/documents.parquet"))
    val schema = spark.read.parquet(docsPath).schema
    val q = score(spark.readStream.schema(schema).parquet(streamDir))
      .writeStream.format("memory").queryName("curation_scores")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("curation_scores").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("splitAssign streams unchanged (incremental corpus split)") {
    // the leakage-safe split is a pure narrow map on the text
    // fingerprint, so arriving shards are assigned identically to a
    // batch run — the property that lets a growing corpus be split
    // shard-by-shard with no reshuffling of past assignments
    val docsPath = s"$sfDir/documents.parquet"
    def assign(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Curation.splitAssign(df, "doc_id", "text", 100, 100)
    val batch = assign(spark.read.parquet(docsPath))
      .collect().map(_.toSeq).toSet
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-split").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(docsPath),
      java.nio.file.Paths.get(s"$streamDir/documents.parquet"))
    val schema = spark.read.parquet(docsPath).schema
    val q = assign(spark.readStream.schema(schema).parquet(streamDir))
      .writeStream.format("memory").queryName("split_assign")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("split_assign").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming CMS registers equal the batch sketch (stream == batch)") {
    // the Count-Min registers are a pure groupBy count, so the SAME
    // column program maintains the sketch incrementally under
    // readStream in complete mode — the live-frequency-monitor
    // deployment shape; its final state must equal the batch sketch
    val liPath = s"$sfDir/lineitem.parquet"
    def sketch(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Stats.cmsRegisters(df, "l_partkey",
        depth = 4, width = 256)
    val batch = sketch(spark.read.parquet(liPath))
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-cms").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(liPath),
      java.nio.file.Paths.get(s"$streamDir/lineitem.parquet"))
    val schema = spark.read.parquet(liPath).schema
    val q = sketch(spark.readStream.schema(schema).parquet(streamDir))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cms_stream").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming bin-count quantile state equals the batch sketch") {
    // binCounts is a pure groupBy count — the same column program
    // maintains the quantile-sketch STATE incrementally in complete
    // mode; the finisher then runs over the tiny final frame. Feed the
    // stream in two generations to exercise the additive merge.
    val liPath = s"$sfDir/lineitem.parquet"
    val li = spark.read.parquet(liPath)
    def counts(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Stats.binCounts(df, "l_extendedprice",
        lo = 0L, width = 1000L, nBins = 100)
    val batchQ = graft.operators.Stats.quantilesFromBins(counts(li),
      0L, 1000L, Seq(500, 990)).collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-binq").toString
    val schema = li.schema
    val q = counts(spark.readStream.schema(schema).parquet(streamDir))
      .writeStream.format("memory").queryName("binq_stream")
      .outputMode("complete").start()
    try {
      li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 2 === 0)
        .write.mode("append").parquet(streamDir)
      q.processAllAvailable()
      li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 2 =!= 0)
        .write.mode("append").parquet(streamDir)
      q.processAllAvailable()
      val streamedQ = graft.operators.Stats.quantilesFromBins(
        spark.table("binq_stream"), 0L, 1000L, Seq(500, 990))
        .collect().map(_.toSeq).toSet
      assert(streamedQ == batchQ)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch banded join") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val views = events.where(col("event_type") === "view")
    val buys = events.where(col("event_type") === "purchase")
    val batch = graft.operators.TemporalJoin.banded(
      views, buys, "user_id", "user_id", "ts", "ts",
      loUs = 1L, hiUs = 6L * 3600 * 1000000,
      leftCols = Seq("event_id" -> "l_id", "user_id" -> "user_id"),
      rightCols = Seq("event_id" -> "r_id", "value" -> "r_value"))
      .select("user_id", "l_id", "r_id", "r_value", "gap_us")
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-ssj").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def streamed = spark.readStream.schema(schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val joined = EventStream.intervalJoinStreaming(
      streamed.where(col("event_type") === "view"),
      streamed.where(col("event_type") === "purchase"),
      key = "user_id", window = "6 hours")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj").collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-stream OUTER interval join equals batch after watermark flush") {
    val events = graft.sources.Tables.events(spark, sfDir)
    // batch twin: watermark is a no-op in batch, left_outer is exact
    val batch = EventStream.intervalJoinOuterStreaming(
        events.where(col("event_type") === "view"),
        events.where(col("event_type") === "purchase"),
        key = "user_id", window = "6 hours")
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-ssjo").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def streamed = spark.readStream.schema(raw.schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val joined = EventStream.intervalJoinOuterStreaming(
      streamed.where(col("event_type") === "view"),
      streamed.where(col("event_type") === "purchase"),
      key = "user_id", window = "6 hours")
    val q = joined.writeStream.format("memory").queryName("ssjo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // unmatched-left rows only emit once the GLOBAL watermark (the
      // MIN across both sides' event-time trackers) clears their join
      // horizon — so the sentinel flush must advance BOTH the view and
      // the purchase side, or the last window-plus-watermark of views
      // never finalizes. Two flush batches: state evicted by flush 1's
      // watermark is emitted in the next executed batch, and a data
      // batch is more reliable to await than the optional no-data
      // micro-batch. Sentinels are dropped from the comparison by
      // user_id; the flush view/purchase share a timestamp, so the
      // strict r_ts > l_ts band never matches them to each other.
      def flush(id: Long, days: Int): Unit = {
        Seq("view", "purchase").zipWithIndex.foreach { case (et, i) =>
          raw.limit(1)
            .withColumn("event_id", lit(id - i))
            .withColumn("user_id", lit(-999L))
            .withColumn("event_type", lit(et))
            .withColumn("ts", col("ts") + expr(s"INTERVAL $days DAYS"))
            .coalesce(1).write.mode("append").parquet(streamDir)
        }
        q.processAllAvailable()
      }
      flush(-1L, 90)
      flush(-3L, 91)
      val got = spark.table("ssjo").collect().map(_.toSeq)
        .filter(_.head != -999L).toSet
      assert(got == batch)
      // and the outer join genuinely adds unmatched views
      assert(batch.exists(_(2) == null))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join equals batch after flush") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val batch = EventStream.intervalJoinFullStreaming(
        events.where(col("event_type") === "view"),
        events.where(col("event_type") === "purchase"),
        key = "user_id", window = "6 hours")
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-ssjf").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def streamed = spark.readStream.schema(raw.schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val joined = EventStream.intervalJoinFullStreaming(
      streamed.where(col("event_type") === "view"),
      streamed.where(col("event_type") === "purchase"),
      key = "user_id", window = "6 hours")
    val q = joined.writeStream.format("memory").queryName("ssjf")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // same two-batch sentinel flush as the left-outer test: both
      // sides' watermarks must advance for BOTH kinds of unmatched
      // rows to finalize (views with no purchase AND purchases with
      // no preceding view)
      def flush(id: Long, days: Int): Unit = {
        Seq("view", "purchase").zipWithIndex.foreach { case (et, i) =>
          raw.limit(1)
            .withColumn("event_id", lit(id - i))
            .withColumn("user_id", lit(-999L))
            .withColumn("event_type", lit(et))
            .withColumn("ts", col("ts") + expr(s"INTERVAL $days DAYS"))
            .coalesce(1).write.mode("append").parquet(streamDir)
        }
        q.processAllAvailable()
      }
      flush(-1L, 90)
      flush(-3L, 91)
      val got = spark.table("ssjf").collect().map(_.toSeq)
        .filter(_.head != -999L).toSet
      assert(got == batch)
      // full outer genuinely adds BOTH kinds of unmatched rows
      assert(batch.exists(_(2) == null), "expected unmatched views")
      assert(batch.exists(_(1) == null), "expected orphan purchases")
    } finally q.stop()
  }

  test("foreachBatch bloom-dedup ingest equals the sequential batch replay") {
    import graft.streaming.IngestDedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // three generations with planted overlap: B re-crawls half of A,
    // C re-crawls parts of both
    val genA = docs.filter(col("doc_id") < 60)
    val genB = docs.filter(col("doc_id").between(30, 99))
    val genC = docs.filter(col("doc_id").between(80, 149))

    def freshDir(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft-ingest-$tag").toString
    // batch replay = the oracle: same processBatch, driven sequentially
    val replayStore = freshDir("replay")
    Seq(genA, genB, genC).foreach { g =>
      IngestDedup.processBatch(g, replayStore, "doc_id", "text").count()
      CacheScope.drainRegistered()
    }
    val expect = spark.read.parquet(replayStore)
      .collect().map(_.toSeq).toSet

    // streaming run: one file per generation, one micro-batch per file
    val streamStore = freshDir("store")
    val srcDir = freshDir("src")
    val q = IngestDedup.run(
      spark.readStream.schema(genA.schema).parquet(srcDir),
      streamStore, freshDir("ckpt"), "doc_id", "text")
    try {
      Seq(genA, genB, genC).foreach { g =>
        g.coalesce(1).write.mode("append").parquet(srcDir)
        q.processAllAvailable()
      }
      val got = spark.read.parquet(streamStore)
        .collect().map(_.toSeq).toSet
      assert(got == expect)
      // the planted overlap was genuinely deduped: stored ids are the
      // distinct fingerprints' first writers, not the 180 incoming rows
      assert(got.size < 180 && got.nonEmpty)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals agree with groupBy") {
    import spark.implicits._
    import graft.streaming.EventStream.UserEvent
    val events = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").as[UserEvent]
    val got = EventStream.runningUserTotals(events)
      .collect().map(t => t.user_id -> ((t.n_events, t.total_value))).toMap
    val expect = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (u, (n, v)) =>
      assert(n == expect(u)._1)
      assert(math.abs(v - expect(u)._2) < 1e-6)
    }
  }

  test("streaming dedup keeps one row per key, same keys as batch") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val batchKeys = EventStream
      .firstEventPerKey(events, Seq("user_id", "event_type"))
      .select("user_id", "event_type").collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-dedup-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(schema).parquet(streamDir)
      .transform(graft.sources.Tables.normalizeTs)
    val q = EventStream
      .streamingDedup(streamed, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select("user_id", "event_type").collect().map(_.toSeq)
      assert(got.length == got.toSet.size) // exactly one row per key
      assert(got.toSet == batchKeys)
    } finally q.stop()
  }

  test("session_window agrees with the window-function sessionize") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val native = EventStream.sessionWindowAgg(events, "30 minutes")
    val manual = EventStream.sessionize(events, 30)
    assert(native.count() == manual.count())
    // same multiset of (user, session event-count)
    val a = native.groupBy("user_id", "n_events").count()
    val b = manual.groupBy("user_id", "n_events").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("rollingWindow: trailing range frame counts exactly, ties share") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, 10L, ts(0), 5.0), (2L, 10L, ts(30), 7.0),
      (3L, 10L, ts(61), 2.0),           // 0 fell out of the 60s window
      (4L, 10L, ts(61), 9.0),           // tie with event 3: shares frame
      (5L, 99L, ts(30), 1.0))           // other user isolated
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.streaming.EventStream.rollingWindow(ev,
        "event_id", "user_id", "ts", "value", windowUs = 60000000L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_win"), r.getAs[Double]("max_v_win")))).toMap
    assert(out(1L) == ((1L, 5.0)))
    assert(out(2L) == ((2L, 7.0)))      // 0s and 30s both inside
    assert(out(3L) == ((3L, 9.0)))      // 30,61,61 — tie at 61 shared
    assert(out(4L) == ((3L, 9.0)))
    assert(out(5L) == ((1L, 1.0)))
  }

  test("lateEvents: arrival order vs event time, exact lateness") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, 10L, ts(100)), (2L, 10L, ts(90)),  // 10s late
      (3L, 10L, ts(120)), (4L, 10L, ts(95)),  // 25s late
      (5L, 20L, ts(10)), (6L, 20L, ts(20)))   // in order: never late
      .toDF("event_id", "user_id", "ts")
    val out = graft.streaming.EventStream.lateEvents(ev,
        "event_id", "user_id", "ts")
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
          r.getAs[Long]("max_late_us")))).toMap
    assert(out(10L) == ((4L, 2L, 25000000L)))
    assert(out(20L) == ((2L, 0L, 0L)))
  }

  test("multiTouch: prior-window views counted, organic conversions kept") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, 10L, ts(0), "view"), (2L, 10L, ts(50), "view"),
      (3L, 10L, ts(60), "purchase"),       // both views inside 100s
      (4L, 10L, ts(60), "view"),           // SAME instant: gap 0 excluded
      (5L, 20L, ts(10), "purchase"),       // organic: no prior view
      (6L, 30L, ts(0), "view"), (7L, 30L, ts(200), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.streaming.EventStream.multiTouch(ev, "event_id",
        "user_id", "ts", "event_type", "view", "purchase",
        windowUs = 100000000L)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("min_gap_us"),
          r.getAs[Long]("max_gap_us")))).toMap
    assert(out(3L) == ((2L, 10000000L, 60000000L)))
    assert(out(5L) == ((0L, 0L, 0L)))
    assert(out(7L) == ((0L, 0L, 0L))) // view at 0 is outside the 100s
  }

  test("funnel: strict order enforced, greedy earliest completion") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      // user 1 completes in order
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE click -> stops at click
      (2L, ts(10), "view"), (2L, ts(30), "click"), (2L, ts(20), "purchase"),
      // user 3: click only, no view -> never enters
      (3L, ts(10), "click"),
      // user 4: greedy min matters — first view at 10, click at 15,
      // purchase at 18 completes even though a LATER view (17) exists
      (4L, ts(10), "view"), (4L, ts(17), "view"),
      (4L, ts(15), "click"), (4L, ts(18), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.streaming.EventStream.funnel(ev, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 2L))
  }

  test("sessionize: gaps split sessions, counts cover all events") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val sessions = EventStream.sessionize(events, gapMinutes = 30)
    assert(sessions.agg(sum("n_events")).head.getLong(0) == events.count())
    // session bounds are ordered
    assert(sessions.filter(col("session_start") > col("session_end"))
      .count() == 0)
  }
}

class ChangeLogListenerSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.ChangeLogListener

  test("listener replays committed batches into versioned snapshots") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String)]
    val changes = ms.toDF.toDF("seq", "op", "key", "text")
    val dir = java.nio.file.Files.createTempDirectory("clog").toString
    val lst = new ChangeLogListener(s"$dir/index", Seq("key"))
    val q = lst.listen(changes, s"$dir/ckpt")
    try {
      // batch 1: two puts + a same-batch overwrite of key 1
      ms.addData((1L, "put", 1L, "one"), (2L, "put", 2L, "two"),
        (3L, "put", 1L, "one-v2"))
      q.processAllAvailable()
      val v1 = lst.currentIndex(spark).get
        .as[(Long, String)].collect().toMap
      assert(v1 == Map(1L -> "one-v2", 2L -> "two"))
      // batch 2: delete key 2, add key 3, put-then-del key 4 (net: absent)
      ms.addData((4L, "del", 2L, ""), (5L, "put", 3L, "three"),
        (6L, "put", 4L, "four"), (7L, "del", 4L, ""))
      q.processAllAvailable()
      val v2 = lst.currentIndex(spark).get
        .as[(Long, String)].collect().toMap
      assert(v2 == Map(1L -> "one-v2", 3L -> "three"))
    } finally q.stop()
  }

  test("streaming as-of enrichment equals asOfBackward under in-order batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream.AsOfEv
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq( // user 1 and 2, ts <= 20
      AsOfEv(1L, 1L, 10L, "view"), AsOfEv(1L, 3L, 10L, "view"), // tie: id 3 wins
      AsOfEv(1L, 2L, 20L, "purchase"),
      AsOfEv(2L, 7L, 5L, "purchase")) // no prior view -> nulls
    val b2 = Seq( // later batch: state carries across
      AsOfEv(1L, 4L, 30L, "purchase"), // still enriched by view 3
      AsOfEv(1L, 5L, 40L, "view"),
      AsOfEv(1L, 6L, 40L, "purchase")) // same-instant view counts (<=)
    val ms = MemoryStream[AsOfEv]
    val out = graft.streaming.EventStream.asOfViewStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("asof_stream")
        .as[(Long, Long, Long, Option[Long], Option[Long])]
        .collect().map(r => r._1 -> r._4).toMap
      // batch twin over ALL events
      val all = (b1 ++ b2).toDS().toDF()
      val batch = graft.operators.TemporalJoin.asOfBackward(
        all.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id"),
            col("ts_us").as("buy_ts")),
        all.filter(col("event_type") === "view")
          .select(col("user_id").as("_vu"), col("ts_us").as("view_ts"),
            col("event_id").as("view_id")),
        leftKey = "user_id", rightKey = "_vu",
        leftTime = "buy_ts", rightTime = "view_ts",
        rightTieBreak = "view_id", rightCols = Seq("view_id"))
        .select("buy_id", "view_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(streamed.keySet == batch.keySet)
      assert(streamed == batch) // incl. the tie (view 3) and the nulls
      assert(streamed(2L).contains(3L)) // state carried across batches
      assert(streamed(6L).contains(5L)) // same-instant view visible
    } finally q.stop()
  }

  test("streaming HLL registers: merged snapshots equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val values = ms.toDF.toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("sdist").toString
    val sd = new graft.streaming.StreamingDistinct(s"$dir/regs", "v", 8)
    val q = sd.run(values, s"$dir/ckpt")
    try {
      ms.addData(0L until 4000L: _*)
      q.processAllAvailable()
      ms.addData(3000L until 9000L: _*) // overlap: max is idempotent
      q.processAllAvailable()
      val streamed = sd.currentRegisters(spark).get
        .as[(Long, Long)].collect().toMap
      val batch = graft.operators.Stats.hllRegisters(
          spark.range(0, 9000).toDF("v"), "v", 8)
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch) // stream == batch, register-exact
      val est = sd.estimate(spark)
      assert(math.abs(est - 9000) < 9000 * 0.26, s"est=$est")
    } finally q.stop()
  }

  test("ingest snapshots compact in place; committed reads unchanged") {
    // the CompactTask workflow a continuous-ingest user runs: micro-
    // batches fragment the snapshot dir; compact rewrites it without
    // breaking the committed-version protocol (_SUCCESS survives)
    val dir = java.nio.file.Files.createTempDirectory("clogc").toString
    val lst = new ChangeLogListener(s"$dir/index", Seq("key"))
    def batch(seqs: Range, tag: String) = seqs.map(i =>
      (i.toLong, "put", (i % 50).toLong, s"$tag$i"))
      .toDF("seq", "op", "key", "text")
    // AQE would coalesce the toy batches to one output file; a real
    // micro-batch stream fragments by (batches x shuffle partitions)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      lst.applyBatch(batch(1 to 200, "a").repartition(8), 1L)
      lst.applyBatch(batch(201 to 400, "b").repartition(8), 2L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val before = lst.currentIndex(spark).get
      .as[(Long, String)].collect().toMap
    val v2dir = new java.io.File(s"$dir/index/v2")
    val fragged = v2dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(fragged >= 2, s"fixture not fragmented: $fragged")
    val after = graft.sources.BucketedStore.compact(spark,
      s"$dir/index/v2", targetFileBytes = 64L << 20)
    assert(after < fragged)
    assert(new java.io.File(s"$dir/index/v2/_SUCCESS").exists(),
      "compacted snapshot must stay committed")
    val re = lst.currentIndex(spark).get
      .as[(Long, String)].collect().toMap
    assert(re == before)
  }

  test("multimodal codec stage runs unchanged under structured streaming") {
    // the iterator-to-iterator mapPartitions decode is exactly the
    // batch shape streaming micro-batches execute — prove it: stream
    // ids through synthesize -> decode -> running decoded-dims agg
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Long]
    val decoded = Multimodal.decode(
      Multimodal.synthesize(ms.toDF.toDF("doc_id"), "doc_id"))
    val q = decoded.toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), sum(col("width")).as("w_sum"))
      .writeStream.format("memory").queryName("mm_stream")
      .outputMode("complete").start()
    try {
      ms.addData(0L to 5L)
      q.processAllAvailable()
      ms.addData(6L to 11L)
      q.processAllAvailable()
      val got = spark.table("mm_stream").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // 12 ids -> 4 of each format; image width sums match the spec
      val wantPng = (0L to 11L).filter(Multimodal.specFormat(_) == "png")
      val wantBmp = (0L to 11L).filter(Multimodal.specFormat(_) == "bmp")
      assert(got("png") ==
        ((4L, wantPng.map(Multimodal.specWidth(_).toLong).sum)))
      assert(got("bmp") ==
        ((4L, wantBmp.map(Multimodal.specWidth(_).toLong).sum)))
      assert(got("wav") == ((4L, 0L)))
    } finally q.stop()
  }

  test("compact crash states all recover without data loss") {
    import graft.sources.BucketedStore
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("crashrec").toString
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(p: String): Unit = spark.range(100).toDF("id")
      .coalesce(2).write.mode("overwrite").parquet(p)
    def rows(p: String): Set[Long] =
      spark.read.parquet(p).as[Long].collect().toSet
    val all = (0L until 100).toSet

    // state 1: crash before the stage rename — stale tmp, intact main
    val s1 = s"$base/s1"; write(s1); write(s1 + "._compact_tmp")
    BucketedStore.recover(spark, s1)
    assert(rows(s1) == all)
    assert(!fs.exists(new Path(s1 + "._compact_tmp")))

    // state 2: crash between the renames — main ABSENT, old holds the
    // original, tmp holds the compacted copy; original is restored
    val s2 = s"$base/s2"
    write(s2 + "._compact_old"); write(s2 + "._compact_tmp")
    BucketedStore.recover(spark, s2)
    assert(rows(s2) == all)
    assert(!fs.exists(new Path(s2 + "._compact_old")))

    // state 3: crash after publish — compacted main, stale old
    val s3 = s"$base/s3"; write(s3); write(s3 + "._compact_old")
    BucketedStore.recover(spark, s3)
    assert(rows(s3) == all)
    assert(!fs.exists(new Path(s3 + "._compact_old")))

    // compact() self-heals state 2 inline, then compacts normally
    val s4 = s"$base/s4"; write(s4 + "._compact_old")
    val n = BucketedStore.compact(spark, s4, targetFileBytes = 512L << 20)
    assert(n == 1 && rows(s4) == all)
  }
}
