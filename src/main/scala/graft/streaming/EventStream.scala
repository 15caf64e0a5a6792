package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming-shaped event processing. The reference has no
 * stream operators (SURVEY.md §2.10 — its closest artifact is the
 * raft-WAL Listener tailing committed batches into an external sink);
 * this module supplies the Spark-native equivalent surface for the
 * `events` table: watermarked tumbling-window aggregation and
 * gap-based sessionization.
 *
 * Every transform is written against an unbounded DataFrame — the same
 * code runs in a batch job (for the oracle) and under `readStream` with
 * a watermark (tested in StreamingSpec via the file source).
 */
object EventStream {

  /**
   * Stream-static dimension enrichment: every event left-joined to a
   * broadcast static dimension table. This exact plan runs unchanged
   * under Structured Streaming (stream-static equi-joins are natively
   * supported, stateless, no watermark needed) — the streaming twin is
   * asserted in StreamingSpec. At scale the dimension side is the
   * broadcast-able one by construction (users/customers, not events);
   * the event stream itself never shuffles.
   */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    val d = dim.select((dimKey +: dimCols).map(col): _*)
    events.join(broadcast(d), events(eventKey) === d(dimKey), "left")
      .drop(dimKey)
  }

  /** Tumbling-window counts/sums per event type. Window start is
    * emitted as a formatted string key so results are portable. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.quant(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm")
        .as("window_start"), col("event_type"), col("n_events"),
        col("sum_value"))

  /**
   * Per-window top-k event types — the heavy-hitter dashboard tile
   * over tumbling hour windows (the bounded-cardinality twin of
   * [[graft.operators.Stats.cmsHeavyHitters]]: when the key alphabet
   * is small the exact count IS affordable, and the rank makes the
   * tile). Deterministic rank: count desc, type asc. Batch statement;
   * under `readStream` the same count aggregate runs watermarked and
   * the rank is applied per emitted window in `foreachBatch`.
   *
   * Scale shape: one map-side-combinable (window, type) count shuffle;
   * the rank window partitions per hour over the TYPE alphabet and
   * plans as WindowGroupLimit.
   */
  def windowTopK(events: DataFrame, k: Int): DataFrame =
    windowTopKFinish(windowCounts(events), k)

  /** The streamable half of [[windowTopK]]: the watermark-compatible
    * (window, type) count aggregate. Runs identically batch or under
    * `readStream`. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** The rank finisher of [[windowTopK]], applied to [[windowCounts]]
    * output — in streaming, per emitted micro-batch/table (rank is not
    * a streaming-supported window function; the counts are). */
  def windowTopKFinish(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val wk = Window.partitionBy(col("w"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(wk).cast("long"))
      .filter(col("rk") <= k)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm")
        .as("window_start"), col("event_type"), col("n_events"),
        col("rk"))
  }

  /** Streaming variant: watermark bounds state for late data. */
  def windowedAggStreaming(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark))

  /** Native session windows (the streaming formulation of
    * [[sessionize]]): gap-merged per-user sessions via
    * `session_window`, usable batch or streaming-with-watermark. */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.quant(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String,
      value: Double)
  final case class UserTotals(user_id: Long, n_events: Long,
      total_value: Double)

  /**
   * Custom keyed state via `mapGroupsWithState`: per-user running
   * totals that survive across micro-batches — the Structured
   * Streaming state-store primitive for operators the built-in
   * aggregations can't express. Runs identically over a batch Dataset
   * (single "micro-batch").
   */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = it.foldLeft(prev) { (acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }

  /**
   * Recency-weighted activity score with EXACT integer geometric decay
   * — the float-free statement of exponential time decay (recency
   * scoring, decayed frequency caps): an event `b` half-life buckets
   * old weighs `2^(maxShift−b)` (newest = 2^maxShift, halving per
   * bucket, 0 beyond maxShift buckets). Power-of-two weights make the
   * score a BIGINT sum — bit-identical everywhere — while ordering
   * users exactly as the e^-λt version would at bucket resolution.
   * "Now" is the frame's max timestamp (one aggregated scalar,
   * broadcast) so the score is a pure function of the data.
   *
   * Scale shape: one scalar aggregate + one narrow map + one per-user
   * combinable sum — corpus-linear, no window.
   */
  def decayedActivity(events: DataFrame, userCol: String, tsCol: String,
      halfLifeUs: Long, maxShift: Int): DataFrame = {
    require(halfLifeUs >= 1 && maxShift >= 1 && maxShift <= 62,
      "halfLifeUs >= 1, maxShift in [1,62]")
    val now = events.agg(max(unix_micros(col(tsCol))).as("now_us"))
    events.select(col(userCol), unix_micros(col(tsCol)).as("ts_us"))
      .crossJoin(broadcast(now))
      .withColumn("b", expr(s"(now_us - ts_us) div ${halfLifeUs}L"))
      .withColumn("w", when(col("b") <= maxShift,
        expr(s"shiftleft(1L, cast($maxShift - b as int))"))
        .otherwise(lit(0L)))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("decay_score"))
  }

  /** Input/output rows for [[asOfViewStreaming]]. */
  final case class AsOfEv(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String)
  final case class AsOfViewState(view_ts_us: Long, view_id: Long)
  final case class AsOfEnriched(buy_id: Long, user_id: Long,
      buy_ts_us: Long, view_id: Option[Long], view_ts_us: Option[Long])

  /**
   * Streaming as-of enrichment — the stateful twin of
   * [[graft.operators.TemporalJoin.asOfBackward]]: every purchase is
   * emitted with the user's latest at-or-before view. Stream-stream
   * joins can't express "latest prior" (they band, they don't carry);
   * the carry IS per-key state, so this is flatMapGroupsWithState with
   * O(1) state per user (the latest view's (ts, id) — two longs, the
   * whole fleet's state is |users|·16 bytes, never event-count-sized).
   *
   * Each micro-batch's group iterator is sorted by (ts, id) before the
   * fold (Spark guarantees no order), with ties resolving to the
   * larger view id — the exact [[TemporalJoin.asOfBackward]] tie law.
   * Correctness across batches assumes per-user in-order delivery
   * (the Kafka key-partition contract); a view arriving AFTER its
   * purchase's batch cannot retroactively enrich it — the documented
   * at-most-late-by-a-batch trade every low-latency enrichment makes.
   */
  def asOfViewStreaming(events: org.apache.spark.sql.Dataset[AsOfEv])
      : org.apache.spark.sql.Dataset[AsOfEnriched] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[AsOfEv],
            state: GroupState[AsOfViewState]) =>
          var st = state.getOption
          val out = Vector.newBuilder[AsOfEnriched]
          it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" =>
                // at equal ts the larger id wins (asOfBackward tie law)
                if (st.forall(s => e.ts_us > s.view_ts_us ||
                    (e.ts_us == s.view_ts_us && e.event_id >= s.view_id)))
                  st = Some(AsOfViewState(e.ts_us, e.event_id))
              case "purchase" =>
                out += AsOfEnriched(e.event_id, uid, e.ts_us,
                  st.map(_.view_id), st.map(_.view_ts_us))
              case _ => ()
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /**
   * First-arrival dedup per key (batch formulation): keep each key's
   * earliest event by (ts, event_id) — the replayable batch statement of
   * streaming ingest dedup. The streaming formulation is
   * [[streamingDedup]]; both keep exactly one row per key, and when the
   * stream arrives in (ts, event_id) order they keep the same row.
   * Top-1-per-key plans as WindowGroupLimit (map-side prune before the
   * shuffle) — dedup of a 100 TB ingest moves one row per key per task.
   */
  def firstEventPerKey(events: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Streaming ingest dedup: `dropDuplicatesWithinWatermark` bounds the
    * key state to the watermark horizon — the unbounded-state
    * `dropDuplicates` is a leak on an infinite stream. */
  def streamingDedup(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /**
   * Stream-stream interval join — the streaming form of
   * [[graft.operators.TemporalJoin.banded]]: every (left, right) pair
   * with equal keys and `right.ts − left.ts` within (0, `window`].
   * Both sides carry watermarks and the join condition bounds the time
   * range in BOTH directions, which is what lets Spark expire buffered
   * state instead of holding each side forever (the unbounded
   * stream-stream join is rejected in append mode for exactly that
   * reason). Works identically on batch frames — the spec drives it
   * both ways and cross-checks against the batch banded join.
   */
  def intervalJoinStreaming(left: DataFrame, right: DataFrame,
      key: String, window: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key).as("_lk"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("_rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"""_lk = _rk AND r_ts > l_ts AND r_ts <= l_ts + interval $window"""))
      .select(col("_lk").as(key), col("l_id"), col("r_id"),
        col("r_value"), (unix_micros(col("r_ts")) -
          unix_micros(col("l_ts"))).as("gap_us"))
  }

  /**
   * Stream-stream LEFT OUTER interval join — [[intervalJoinStreaming]]
   * plus the unmatched-left rows (a view with no purchase inside the
   * window), which Structured Streaming emits once the watermark
   * passes the left row's join horizon and no future right row can
   * match. The production attribution shape: every touch gets a row,
   * matched or not; unmatched rows carry null right columns and a
   * null gap. Both-side watermarks + the two-sided time bound are what
   * make the buffered state expirable — exactly the
   * [[intervalJoinStreaming]] law, plus outer rows on expiry. The
   * identical plan runs in batch (watermark is a no-op there); the
   * batch run faces the DuckDB oracle and StreamingSpec asserts
   * stream == batch.
   */
  def intervalJoinOuterStreaming(left: DataFrame, right: DataFrame,
      key: String, window: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key).as("_lk"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("_rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"""_lk = _rk AND r_ts > l_ts AND r_ts <= l_ts + interval $window"""),
      "left_outer")
      .select(col("_lk").as(key), col("l_id"), col("r_id"),
        col("r_value"), (unix_micros(col("r_ts")) -
          unix_micros(col("l_ts"))).as("gap_us"))
  }

  /**
   * Stream-stream FULL OUTER interval join — the symmetric completion
   * of [[intervalJoinOuterStreaming]]: every left row gets a row
   * (matched or expired-unmatched, null right columns) AND every right
   * row gets a row (a purchase with no view inside its preceding
   * window — the orphan-conversion shape attribution audits hunt).
   * Structured Streaming emits each side's unmatched rows once the
   * watermark clears that side's join horizon; the two-sided time
   * bound keeps buffered state expirable, exactly the
   * [[intervalJoinStreaming]] law. The key column coalesces across
   * sides (null on the unmatched side of an outer row). Identical
   * plan runs in batch (watermark no-op); the batch run faces the
   * DuckDB oracle and StreamingSpec asserts stream == batch.
   */
  def intervalJoinFullStreaming(left: DataFrame, right: DataFrame,
      key: String, window: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key).as("_lk"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("_rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"""_lk = _rk AND r_ts > l_ts AND r_ts <= l_ts + interval $window"""),
      "full_outer")
      .select(coalesce(col("_lk"), col("_rk")).as(key), col("l_id"),
        col("r_id"), col("r_value"), (unix_micros(col("r_ts")) -
          unix_micros(col("l_ts"))).as("gap_us"))
  }

  /**
   * Gap-based sessionization (batch formulation): a new session starts
   * when a user's inter-event gap reaches `gapMinutes` (gap >= threshold
   * splits — the same boundary rule as Spark's `session_window`, whose
   * half-open [start, start+gap) windows exclude an event landing
   * exactly at the gap). Emits one row per session with bounds and
   * counts. (The streaming formulation is `session_window`; this
   * window-function form is the batch oracle of [[sessionWindowAgg]].)
   */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionIndexed(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))

  /** Events with their gap-based `session_idx` attached (one user
    * shuffle; event_id tie-break so equal timestamps order
    * deterministically) — the shared base under [[sessionize]] and
    * [[sessionPaths]]. */
  def sessionIndexed(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            >= gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_session")
  }

  /**
   * Session path mining — the behavioral-sequence census product
   * analytics runs (Sankey / funnel discovery): each session becomes
   * the `>`-joined sequence of its first `maxLen` event types (time
   * order, event-id tie-break), and the top-`topK` paths are ranked by
   * session count (ties by path — deterministic). Unlike [[funnel]],
   * which counts ONE prescribed order, this surfaces the orders that
   * actually occur.
   *
   * Scale shape: one user shuffle for the session index (shared law
   * with [[sessionize]]), a per-session ROWS window truncating to
   * `maxLen` (bounded groups), a path-sized count aggregate, and a
   * rank window over the PATH ALPHABET (≤ |types|^maxLen, vocab-like,
   * never session-count-sized).
   */
  def sessionPaths(events: DataFrame, gapMinutes: Int, maxLen: Int,
      topK: Int): DataFrame = {
    require(maxLen >= 1 && topK >= 1, "maxLen and topK must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val byS = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    val paths = sessionIndexed(events, gapMinutes)
      .withColumn("rn", row_number().over(byS))
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("rn"),
          col("event_type").as("et")))),
        x => x.getField("et"))).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
      .filter(col("rnk") <= topK)
      .select("rnk", "path", "n_sessions")
  }

  /**
   * Per-event trailing-window activity features — the "what happened in
   * this user's last hour" columns a realtime feature store serves
   * (fraud velocity checks, rate limiting, session heat). For each
   * event: the count and max value of the SAME user's events in the
   * preceding `windowUs` microseconds (closed at BOTH edges — an event
   * exactly `windowUs` old is still inside, the RANGE n PRECEDING law
   * on either engine). Count and max only — both order-free, so the gate
   * hash is engine-portable; a float mean over a RANGE frame is not
   * (engines disagree on frame-sum association) and stays out.
   *
   * Scale shape: ONE user-keyed shuffle + a per-user time-ordered
   * RANGE frame — the frame is computed by a running two-pointer scan
   * within the partition, cost O(events per user), no self-join (the
   * naive time-band self-join pays rows × window-density). Hot users
   * cost their own event count, never a cross product.
   */
  def rollingWindow(events: DataFrame, idCol: String, userCol: String,
      tsCol: String, valueCol: String, windowUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u")).orderBy(col("t"))
      .rangeBetween(-windowUs, 0)
    events.select(col(idCol), col(userCol).as("u"),
        unix_micros(col(tsCol)).as("t"), col(valueCol).as("v"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("max_v_win",
        graft.functions.Portable.quant(max(col("v")).over(w), 4))
      .select(col(idCol), col("u").as(userCol), col("t"),
        col("n_win"), col("max_v_win"))
  }

  /**
   * Inter-event gap histogram — the burstiness diagnostic of an event
   * stream (heavy-tailed gap spectra flag bot traffic and ingest
   * stalls; Barabási 2005 established the human-activity power law):
   * per-user consecutive-event gaps in seconds, folded into fixed-width
   * `binSec` buckets capped at `maxBin` (the catch-all tail). Output:
   * (bin, n_gaps, n_users) — all-integer.
   *
   * Scale shape: one user-keyed shuffle + a per-user lag window, then
   * a ≤maxBin+1-row count aggregate (map-side combinable). The
   * distinct-user count per bin rides the same aggregate as an exact
   * count over the (bin, user) pre-collapse — two small shuffles, both
   * bounded by bins × users, never corpus-sized.
   */
  def intereventHist(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, binSec: Long, maxBin: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binSec >= 1 && maxBin >= 1, "binSec and maxBin must be >= 1")
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("eid"))
    val gaps = events.select(col(userCol).as("u"),
        unix_micros(col(tsCol)).as("t"), col(idCol).as("eid"))
      .withColumn("gap_us", col("t") - lag(col("t"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .select(col("u"),
        least(expr(s"gap_us div ${1000000L * binSec}"),
          lit(maxBin.toLong)).as("bin"))
    gaps.groupBy("bin")
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("u")).as("n_users"))
  }

  /**
   * Event-type transition matrix — the first-order Markov evidence of
   * user behavior (what follows what): counts of consecutive
   * (prev_type → type) pairs within each user's time-ordered stream,
   * the exact-integer input to session modeling, anomaly scoring, and
   * funnel design. Event-id tie-break keeps equal timestamps
   * deterministic.
   *
   * Scale shape: one user-keyed shuffle + a per-user lag window, then
   * a matrix-sized (|types|²) count aggregate — map-side combinable,
   * so a hot user costs their own events, never a reducer funnel.
   */
  def typeTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("eid"))
    events.select(col(userCol).as("u"), unix_micros(col(tsCol)).as("t"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .withColumn("prev_et", lag(col("et"), 1).over(w))
      .filter(col("prev_et").isNotNull)
      .groupBy(col("prev_et").as("from_type"), col("et").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /**
   * Late-event accounting — the measurement that SIZES a watermark
   * before anyone picks one: per user, how many events arrive (in
   * `idCol` order, the ingestion sequence) with an event time BEHIND
   * the running maximum already seen, and by how much at worst. A
   * watermark below the observed p100 lateness silently drops rows;
   * this op turns that risk into exact integers first.
   *
   * Scale shape: one user-keyed shuffle + a per-user ROWS frame
   * (running max — incremental within the partition), one rollup.
   * Order is the unique event id, so the frame is deterministic.
   */
  def lateEvents(events: DataFrame, idCol: String, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u")).orderBy(col("eid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(col(idCol).as("eid"), col(userCol).as("u"),
        unix_micros(col(tsCol)).as("t"))
      .withColumn("late_us",
        when(max(col("t")).over(w) > col("t"),
          max(col("t")).over(w) - col("t")).otherwise(lit(0L)))
      .groupBy(col("u").as(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
  }

  /**
   * Multi-touch attribution evidence — per conversion event, how many
   * of the same user's touch events (views) preceded it within the
   * lookback window, plus the nearest and farthest touch gaps. The
   * exact-integer inputs every attribution model (last-touch,
   * first-touch, linear, time-decay) folds client-side — the engine
   * emits the evidence, not one model's float credit split.
   * Conversions with no prior touch keep a row (n_touches = 0) — the
   * organic-conversion baseline.
   *
   * Scale shape: the pair generation is [[graft.operators.TemporalJoin
   * .banded]]'s time-bucketed equi-join (a hot user pays rows-per-
   * window, never user² across all time), one map-side-combinable
   * per-conversion aggregate, one vertex-sized left join back.
   */
  def multiTouch(events: DataFrame, idCol: String, userCol: String,
      tsCol: String, typeCol: String, touchType: String, convType: String,
      windowUs: Long): DataFrame = {
    val pairs = graft.operators.TemporalJoin.banded(
      events.filter(col(typeCol) === touchType),
      events.filter(col(typeCol) === convType),
      leftKey = userCol, rightKey = userCol,
      leftTime = tsCol, rightTime = tsCol,
      loUs = 1L, hiUs = windowUs,
      leftCols = Seq(idCol -> "touch_id"),
      rightCols = Seq(idCol -> "conv_id"))
    val agg = pairs.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_touches"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
    events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol),
        unix_micros(col(tsCol)).as("conv_t"))
      .join(agg, Seq("conv_id"), "left")
      .select(col("conv_id"), col(userCol), col("conv_t"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("min_gap_us"), lit(0L)).as("min_gap_us"),
        coalesce(col("max_gap_us"), lit(0L)).as("max_gap_us"))
  }

  /**
   * Ordered funnel analysis — the product-analytics staple (how many
   * users progressed view → click → purchase, IN ORDER): per step, the
   * count of users with a strictly time-increasing event subsequence
   * matching the step prefix. Greedy earliest-completion per step is
   * exact for the exists-a-subsequence semantics: taking the MINIMUM
   * feasible timestamp at each step dominates any later choice.
   *
   * Scale shape: one persisted (user, ts, type) projection (filtered to
   * the step types at the scan); per step ONE map-side-combinable min
   * aggregate + one user-keyed join against the reached set (monotone
   * shrinking, AQE-broadcastable as the funnel narrows). Never a
   * window over a hot user, never a per-user event sort; O(steps)
   * user-sized frames pinned (funnels are 3–7 steps by nature).
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"),
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("et"))
      .filter(col("et").isin(steps: _*))
      .transform(graft.CacheScope.persist(_))
    var reached = ev.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("rt"))
      .transform(graft.CacheScope.persist(_))
    val counts = scala.collection.mutable.ArrayBuffer(
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(1L).as("step"), lit(steps.head).as("step_name"),
          col("n_users")))
    for ((s, i) <- steps.tail.zipWithIndex) {
      reached = ev.filter(col("et") === s)
        .join(reached, Seq("u"))
        .filter(col("t") > col("rt"))
        .groupBy(col("u")).agg(min(col("t")).as("rt"))
        .transform(graft.CacheScope.persist(_))
      counts += reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2L).as("step"), lit(s).as("step_name"),
          col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  /**
   * Hourly peak session concurrency — the capacity-planning sweep-line
   * (max simultaneous open sessions per hour drives connection-pool,
   * state-store, and rate-limit sizing): sessions come from
   * [[sessionIndexed]]'s gap rule, each contributes a +1 delta at its
   * first event and a −1 at its last (closed interval — a one-event
   * session is live at its instant), and the running sum of deltas in
   * time order is the concurrency; per hour the maximum is emitted.
   * Ties at one instant process all +1 before any −1, so the peak
   * counts a session ending exactly when another starts as
   * overlapping; within a same-(ts, delta) class the running sum is
   * monotone, so the per-hour max is deterministic under any tie
   * order. Output (hr, peak): epoch-hour and its max concurrency —
   * hours with no session boundary are omitted (concurrency is flat
   * across them at the previous hour's closing value).
   *
   * Scale shape: the corpus collapses to one session-bounds frame
   * (the sessionize shuffle), then to 2 delta rows per session. The
   * global prefix sum is the repo's two-level law (tokenBudgetTrim's
   * shape): deltas rank locally inside their hour, and a window over
   * the tiny hour-totals frame turns per-hour sums into exclusive
   * offsets — no corpus-sized unpartitioned window anywhere.
   */
  def peakConcurrency(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = sessionIndexed(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(unix_micros(min(col("ts"))).as("s"),
        unix_micros(max(col("ts"))).as("e"))
    val deltas = bounds.select(col("s").as("t"), lit(1L).as("delta"))
      .unionByName(bounds.select(col("e").as("t"), lit(-1L).as("delta")))
      .withColumn("hr", expr("t div 3600000000"))
      .transform(graft.CacheScope.persist(_)) // offsets + local scan
    val offsets = deltas.groupBy(col("hr"))
      .agg(sum(col("delta")).as("hr_sum"))
      .withColumn("offset", coalesce(sum(col("hr_sum")).over(
        Window.orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("hr_sum")
    val localW = Window.partitionBy(col("hr"))
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas.join(offsets, Seq("hr"))
      .withColumn("cum", col("offset") + sum(col("delta")).over(localW))
      .groupBy(col("hr")).agg(max(col("cum")).as("peak"))
  }
}
