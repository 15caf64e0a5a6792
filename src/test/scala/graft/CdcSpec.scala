package graft

import graft.operators.Audit
import graft.streaming.ChangeLogListener
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("changeDataFeed -> applyChanges round-trips to the target snapshot") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("k", "name", "v")
    val v2 = Seq((1L, "a", 10L), // unchanged
      (2L, "B", 20L), // updated name
      (4L, "d", 41L), // updated value
      (9L, "z", 90L)) // inserted; key 3 deleted
      .toDF("k", "name", "v")
    val feed = Audit.changeDataFeed(base, v2, Seq("k"), Seq("name", "v"))
    val ops = feed.as[(Long, String, Option[String], Option[Long])]
      .collect().map(r => r._1 -> r._2).toMap
    assert(ops == Map(2L -> "upd", 4L -> "upd", 3L -> "del", 9L -> "ins"))
    // the round-trip law: replaying the feed over base yields v2
    val replayed = ChangeLogListener.applyChanges(base,
      feed.withColumn("seq", lit(1L))
        .withColumn("op", when(col("op") === "del", "del")
          .otherwise("put")),
      Seq("k"))
      .as[(Long, String, Long)].collect().toSet
    val target = v2.as[(Long, String, Long)].collect().toSet
    assert(replayed == target)
  }

  test("merkleDiff: localizes divergence to buckets, empty on equality") {
    import spark.implicits._
    val a = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (17L, "q", 40L)).toDF("k", "name", "v")
    // identical replicas: no diverged buckets
    assert(Audit.merkleDiff(a, a, "k", Seq("name", "v"), 16).count() == 0)
    // buckets follow the md5-window-of-key law (key-type agnostic —
    // ADVICE r10: pmod on the raw key NULLs out non-numeric keys)
    def bkt(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 16
    }
    // value flip on k=2; missing row k=17 (shares bucket 14 with k=3)
    val b = Seq((1L, "a", 10L), (2L, "b", 99L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    val d = Audit.merkleDiff(a, b, "k", Seq("name", "v"), 16)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(d.keySet == Set(bkt(2L), bkt(17L)))
    assert(d(bkt(17L))._1 == 2L && d(bkt(17L))._2 == 1L) // k=17 missing
    assert(d(bkt(2L))._1 == 1L && d(bkt(2L))._2 == 1L &&
      d(bkt(2L))._3 != d(bkt(2L))._4) // same count, different fp
    // order independence: fingerprints invariant under repartition
    val d2 = Audit.merkleDiff(a.repartition(7), b.repartition(3), "k",
      Seq("name", "v"), 16).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(d2 == d.map { case (k, t) => (k, t._3, t._4) }.toSet)
    CacheScope.drain(spark)
  }

  test("reciprocity: mutual share, self-loops and dupes dropped") {
    import spark.implicits._
    val arcs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (4L, 4L))
      .toDF("s", "d")
    val r = Audit.reciprocity(arcs, "s", "d").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((3L, 2L, 666666L)))
    CacheScope.drain(spark)
  }

  test("intereventHist: bins, cap, per-user distinct counting") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000)
    // user 1: gaps 30s (bin 0), 90s (bin 1); user 2: one huge gap (cap)
    val ev = Seq(
      (1L, 1L, at(0)), (2L, 1L, at(30)), (3L, 1L, at(120)),
      (4L, 2L, at(0)), (5L, 2L, at(1000000))
    ).toDF("event_id", "user_id", "ts")
    val h = graft.streaming.EventStream
      .intereventHist(ev, "user_id", "ts", "event_id",
        binSec = 60, maxBin = 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(h == Map(0L -> ((1L, 1L)), 1L -> ((1L, 1L)),
      5L -> ((1L, 1L))))
    CacheScope.drain(spark)
  }

  test("identical snapshots produce an empty feed") {
    val snap = Seq((1L, "a", 10L), (2L, null.asInstanceOf[String], 20L))
      .toDF("k", "name", "v")
    // null payloads compare null-safely: no spurious upd rows
    assert(Audit.changeDataFeed(snap, snap, Seq("k"),
      Seq("name", "v")).count() == 0)
  }

  test("linkageEval: planted dup families score exact TP/FP/FN") {
    import graft.pipeline.Curation
    val docs = Seq(
      // exact dups with identical prefixes -> truth AND predicted (TP)
      (1L, "alpha beta gamma delta common tail"),
      (2L, "alpha beta gamma delta common tail"),
      // whitespace-normalized dups: fingerprints match (truth) but the
      // raw 12-char keys land in different length bands -> FN
      (3L, "   alpha beta gamma identical body"),
      (4L, "alpha beta gamma identical body"),
      // near-identical prefixes, different bodies -> predicted only (FP)
      (5L, "prefix matchA but the bodies differ wildly one"),
      (6L, "prefix matchB and this text is something else"))
      .toDF("doc_id", "text")
      .withColumn("tkey", substring(col("text"), 1, 12))
    val r = Curation.linkageEval(docs, "doc_id", "text", "tkey",
      maxDist = 2, maxBlockSize = 64, maxGroup = 8).head()
    val (nTruth, nPred, tp, fpc, fnc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(tp >= 1L && nTruth == tp + fnc && nPred == tp + fpc)
    assert(r.getLong(5) == tp * 1000 / nPred) // precision law
    assert(r.getLong(6) == tp * 1000 / nTruth) // recall law
    assert(fpc >= 1L, "prefix-match non-dups must appear as FP")
    assert(fnc >= 1L, "cross-band normalized dups must appear as FN")
  }

  test("decayedActivity: power-of-two weights, zero past the horizon") {
    import graft.streaming.EventStream
    val h = 6L * 3600 * 1000000 // 6h buckets
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val now = 100L * h
    val ev = Seq(
      (1L, t(now)), // b=0 -> 2^16
      (1L, t(now - h)), // b=1 -> 2^15
      (1L, t(now - 17 * h)), // past maxShift -> 0
      (2L, t(now - 16 * h))) // b=16 -> 1
      .toDF("user_id", "ts")
    val out = EventStream.decayedActivity(ev, "user_id", "ts", h, 16)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(1L) == ((3L, 65536L + 32768L + 0L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("windowTopK: per-hour ranks, count-desc then type-asc ties") {
    import graft.streaming.EventStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = (1L to 3L).map(i =>
        (i, 1L, ts("2024-01-01 10:01:00"), "view")) ++
      (4L to 5L).map(i => (i, 1L, ts("2024-01-01 10:02:00"), "click")) ++
      Seq((6L, 1L, ts("2024-01-01 10:03:00"), "buy"),
        (7L, 1L, ts("2024-01-01 10:04:00"), "add"),  // 4 types, k=3 cuts
        (8L, 2L, ts("2024-01-01 12:00:00"), "view"))
    val out = EventStream.windowTopK(
        ev.toDF("event_id", "user_id", "ts", "event_type"), k = 3)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01 10:00", "view", 3L, 1L),
      ("2024-01-01 10:00", "click", 2L, 2L),
      ("2024-01-01 10:00", "add", 1L, 3L),   // add < buy on the tie
      ("2024-01-01 12:00", "view", 1L, 1L)))
  }

  test("peakConcurrency: sweep-line peak per hour, tie overlap") {
    import graft.streaming.EventStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 session [10:00, 10:10]; u2 one-event session at 10:05
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:10:00"), "a"),
      (3L, 2L, ts("2024-01-01 10:05:00"), "a"),
      // u3 alone two hours later
      (4L, 3L, ts("2024-01-01 12:00:00"), "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val hr = (t: java.sql.Timestamp) => t.getTime / 3600000L
    val got = EventStream.peakConcurrency(ev, gapMinutes = 30)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      hr(ts("2024-01-01 10:00:00")) -> 2L,  // u1 open at u2's instant
      hr(ts("2024-01-01 12:00:00")) -> 1L))
  }

  test("sessionPaths: gap splits, truncation, deterministic rank") {
    import graft.streaming.EventStream
    def ts(m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1 session 1: a>b ; session 2 (90min later): a>b
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(5), "b"),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 11:40:00"), "a"),
      (4L, 1L, java.sql.Timestamp.valueOf("2024-01-01 11:41:00"), "b"),
      // user 2: one session a>b>c>d>e>f -> truncated to 5
      (5L, 2L, ts(1), "a"), (6L, 2L, ts(2), "b"), (7L, 2L, ts(3), "c"),
      (8L, 2L, ts(4), "d"), (9L, 2L, ts(5), "e"), (10L, 2L, ts(6), "f"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStream.sessionPaths(ev, gapMinutes = 30, maxLen = 5,
        topK = 10)
      .as[(Long, String, Long)].collect().toList
    assert(out == List((1L, "a>b", 2L), (2L, "a>b>c>d>e", 1L)))
  }
}
