package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream transforms, written once and used from BOTH batch and
  * Structured Streaming (the same DataFrame expressions bind to either
  * — Spark's unified model). Batch runs power the driver's DuckDB
  * correctness gate; the streaming entry points add watermarks and are
  * exercised in ScalaTest via MemoryStream.
  *
  * The reference has no streaming at all (13 blocking batch jobs,
  * PageRank.java:422-498); this is the extension surface
  * (BASELINE.json:6).
  *
  * Scale notes: all aggregations key on (window, event_type) or
  * (user_id, session) — state is bounded by the watermark; shuffle
  * partitions carry only the keyed state, and tumbling/sliding windows
  * use fixed slot arithmetic (no per-event range scans).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding windows (each event lands in width/slide windows). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Per-user session windows with the given inactivity gap. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming variants: same transforms + event-time watermark (late
    * data beyond `lateness` is dropped and state evicted). */
  def tumblingStream(events: DataFrame, width: String,
                     lateness: String): DataFrame =
    tumbling(events.withWatermark("ts", lateness), width)

  /** Streaming sliding windows: the same width/slide assigner as the
    * batch [[sliding]], watermark-bounded — state is the width/slide
    * open windows per key, each evicted once the watermark passes its
    * end (append mode emits it exactly then). */
  def slidingStream(events: DataFrame, width: String, slide: String,
                    lateness: String): DataFrame =
    sliding(events.withWatermark("ts", lateness), width, slide)

  /** Windowed EXACT fixed-point value sums for the drift monitor
    * (q_stream_drift): components quantize to floor(value·10⁶) and sum
    * as DECIMAL(38,0), so the windowed mean is an exact integer
    * function of the data — order-free under ANY micro-batch
    * partitioning (the tumbling gate's raw double sum leans on
    * round(·, 2) to absorb accumulation-order ulps; a drift COMPARISON
    * against a standing mean needs exactness, the q_embed_drift
    * discipline brought to the stream). Watermark-bounded state: one
    * (count, decimal) pair per open (window, key). */
  def driftStream(events: DataFrame, width: String,
                  lateness: String): DataFrame =
    events
      .withColumn("fix",
        floor(col("value") * lit(1.0e6)).cast("decimal(38,0)"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("fix")).as("sfix"))

  /** Tumbling-window approx-distinct users — the sketch family running
    * UNDER the streaming engine: per-window state is the FIXED
    * 2^p-byte HLL register array ([[graft.functions.HllAgg]],
    * mergeable, so micro-batches partial-agg before the keyed state
    * store), regardless of user cardinality. An exact streaming
    * distinct would buffer every user id per open window — the state
    * blow-up this sketch exists to avoid. The emitted value is the
    * raw register array; callers derive the estimate with the fixed
    * float expression (the q_distinct_hll shared-float-path contract),
    * so the stream's output stays an exact integer function of the
    * data. */
  def distinctStream(events: DataFrame, width: String,
                     lateness: String): DataFrame = {
    val hll = udaf(new graft.functions.HllAgg(8))
    events.withWatermark("ts", lateness)
      .withColumn("hv",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .groupBy(window(col("ts"), width).as("w"))
      .agg(hll(col("hv")).as("regs"))
  }

  def sessionsStream(events: DataFrame, gap: String,
                     lateness: String): DataFrame =
    sessions(events.withWatermark("ts", lateness), gap)

  /** Tumbling-window count-min frequency sketch — the second sketch
    * running UNDER the streaming engine (the HLL rationale,
    * [[distinctStream]]): per-window state is the FIXED d·w-counter
    * matrix ([[graft.functions.CountMinAgg]], mergeable, so
    * micro-batches partial-agg before the keyed state store),
    * regardless of how many distinct keys the window sees — the
    * streaming frequency table whose exact form buffers one counter
    * PER KEY per open window. The emitted value is the raw counter
    * matrix (an exact integer function of the data); callers probe it
    * with the min-over-rows estimate, batch-identically. */
  def cmsStream(events: DataFrame, width: String, lateness: String,
                d: Int, w: Int): DataFrame = {
    val cms = udaf(new graft.functions.CountMinAgg(d, w))
    events.withWatermark("ts", lateness)
      .withColumn("hv",
        conv(substring(md5(col("event_type")), 1, 8), 16, 10).cast("long"))
      .groupBy(window(col("ts"), width).as("w"))
      .agg(cms(col("hv")).as("cms"))
  }

  /** Semi-structured props: parse the JSON payload column. */
  def propsK(props: Column): Column =
    get_json_object(props, "$.k").cast("long")

  /** Stream-stream interval join: each error joined to the same user's
    * clicks in the preceding `horizon` — the streaming form of the batch
    * range join (q_events_range). Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can evict
    * buffered state once the watermark passes: state per key is
    * O(events within horizon + lateness), never unbounded. Equi key:
    * user_id (the shuffle key); the time bound is applied within the
    * joined partitions.
    *
    * Inputs: DataFrame["user_id","event_id","ts"] each. */
  def clickErrorJoinStream(clicks: DataFrame, errors: DataFrame,
                           horizon: String, lateness: String): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val e = errors.withWatermark("ts", lateness)
      .select(col("user_id").as("eu"), col("event_id").as("err_id"),
        col("ts").as("ets"))
    e.join(c, col("eu") === col("cu") &&
      col("cts") >= col("ets") - expr(s"INTERVAL $horizon") &&
      col("cts") <= col("ets"))
      .select(col("eu").as("user_id"), col("err_id"), col("click_id"),
        col("cts"), col("ets"))
  }

  /** Streaming exact dedup on an id column within the watermark: the
    * streaming form of q_dedup_exact. `dropDuplicatesWithinWatermark`
    * keeps one row per key and evicts key state once the watermark
    * passes the key's first-seen time + lateness — bounded state, vs
    * plain `dropDuplicates` on a stream which must remember every key
    * forever. */
  def dedupStream(events: DataFrame, idCol: String,
                  lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Per-user running state for custom stateful logic that windowed
    * aggs can't express: emits one row per input batch per user with
    * the lifetime event count and a session-ish "streak" that resets
    * after `gapMinutes` of inactivity — `mapGroupsWithState` with
    * event-time timeout semantics handled manually via the stored
    * last-seen timestamp. State is one small case class per user,
    * bounded by the user population.
    */
  final case class UserState(n: Long, streak: Long, lastSeenMs: Long)
  final case class UserUpdate(user_id: Long, n: Long, streak: Long)

  def userRunningState(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                       gapMinutes: Int): org.apache.spark.sql.Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val ts = rows.map(_._2.getTime).toSeq.sorted
          var st = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
          val gapMs = gapMinutes * 60000L
          ts.foreach { t =>
            val streak =
              if (st.lastSeenMs != Long.MinValue && t - st.lastSeenMs < gapMs)
                st.streak + 1
              else 1L
            st = UserState(st.n + 1, streak, math.max(st.lastSeenMs, t))
          }
          state.update(st)
          UserUpdate(user, st.n, st.streak)
      }
  }

  /** Session-close emission via `flatMapGroupsWithState` — the 0..n-rows
    * -per-group form `mapGroupsWithState` can't express: a user's
    * session stays OPEN in state until a later event arrives more than
    * `gapMinutes` after it, at which point the completed session is
    * emitted (possibly several per batch, possibly none). State is one
    * open session per user — bounded by the user population, and each
    * session is emitted exactly once (append semantics).
    *
    * Cross-batch disorder (ADVICE r4 item 4): within a batch events are
    * sorted, but a batch may deliver an event OLDER than the open
    * session's last timestamp. Such an event is absorbed into the open
    * session when it falls strictly inside the session's reach
    * (> start − gap, matching the batch gaps-and-islands break rule
    * that a delta ≥ gap separates sessions) — extending the start
    * downward if needed — and emitted as its own already-closed
    * singleton when at or beyond that boundary (its true session was
    * closed long ago; with NoTimeout there is no watermark to have
    * bounded it). Sessions can therefore never merge or extend through
    * a negative gap, and already-emitted sessions are never mutated.
    */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(user_id: Long, start: java.sql.Timestamp,
                                 end: java.sql.Timestamp, n: Long)

  def sessionCloseStream(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                         gapMinutes: Int): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val ts = rows.map(_._2.getTime).toSeq.sorted
          val closed = Seq.newBuilder[ClosedSession]
          var cur = state.getOption
          ts.foreach { t =>
            cur match {
              case Some(s) if t <= s.startMs - gapMs =>
                // stale straggler at or beyond the open session's reach
                // (delta ≥ gap breaks, exactly like the batch islands)
                closed += ClosedSession(user, new java.sql.Timestamp(t),
                  new java.sql.Timestamp(t), 1)
              case Some(s) if t <= s.lastMs =>
                // late arrival inside the open session: absorb it
                cur = Some(s.copy(startMs = math.min(s.startMs, t), n = s.n + 1))
              case Some(s) if t - s.lastMs < gapMs =>
                cur = Some(s.copy(lastMs = t, n = s.n + 1))
              case Some(s) =>
                closed += ClosedSession(user, new java.sql.Timestamp(s.startMs),
                  new java.sql.Timestamp(s.lastMs), s.n)
                cur = Some(OpenSession(t, t, 1))
              case None =>
                cur = Some(OpenSession(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** STREAMING event-rate anomaly detection — the flatMapGroupsWithState
    * form of q_events_anomaly, with the causality a stream forces: each
    * user's hourly count is z-scored against that user's RUNNING profile
    * (the hours strictly BEFORE it), not the batch query's full-history
    * profile — a stream cannot see the future, and an alerting pipeline
    * wouldn't want it to. An hour is scored when it CLOSES (a later
    * event arrives in a newer hour); each user's final open hour never
    * closes and is deliberately not emitted (the oracle excludes it the
    * same way).
    *
    * State per user = exact integer moments of the closed hours
    * (n, Σcnt, Σcnt²) + the open hour — a handful of longs, bounded by
    * the user population, chunking-invariant because the per-batch fold
    * (events sorted by ts) composes across batches into the same
    * chronological fold. z is the identical fixed IEEE expression as
    * the batch gate and the oracle (+,·,/,sqrt all correctly rounded →
    * bit-identical; the \|z\| > threshold cut can never flip on an ulp).
    */
  final case class HourProfile(nb: Long, s1: Long, s2: Long,
                               openHourMs: Long, openCnt: Long)
  final case class HourAnomaly(user_id: Long, hour: java.sql.Timestamp,
                               cnt: Long, z: Double)

  def anomalyStream(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                    threshold: Double = 2.0): org.apache.spark.sql.Dataset[HourAnomaly] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val HourMs = 3600000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[HourProfile, HourAnomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val out = Seq.newBuilder[HourAnomaly]
          var st = state.getOption
            .getOrElse(HourProfile(0L, 0L, 0L, Long.MinValue, 0L))
          def closeOpenHour(): Unit = if (st.openHourMs != Long.MinValue) {
            val cnt = st.openCnt
            if (st.nb >= 2) {
              val m = st.s1.toDouble / st.nb
              val varr = (st.s2.toDouble -
                st.s1.toDouble * st.s1.toDouble / st.nb) / (st.nb - 1)
              if (varr > 0) {
                val z = (cnt - m) / math.sqrt(varr)
                if (math.abs(z) > threshold)
                  out += HourAnomaly(user,
                    new java.sql.Timestamp(st.openHourMs), cnt, z)
              }
            }
            st = HourProfile(st.nb + 1, st.s1 + cnt, st.s2 + cnt * cnt,
              Long.MinValue, 0L)
          }
          rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
            val h = Math.floorDiv(t, HourMs) * HourMs
            if (h != st.openHourMs) {
              closeOpenHour()
              st = st.copy(openHourMs = h, openCnt = 1L)
            } else st = st.copy(openCnt = st.openCnt + 1)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
