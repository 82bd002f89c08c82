package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Typed event row for stateful processing. */
final case class Event(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user session state (mapGroupsWithState buffer). */
final case class SessionState(sessions: Long, lastTs: Long, events: Long)

final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Per-event-type anomaly state: the OPEN hourly bucket (hour, n) plus
  * running moments over CLOSED buckets (hours, Σn, Σn²) — fixed size. */
final case class TypeHourState(
    hour: Long, n: Long, hours: Long, sn: Long, sn2: Long)

/** One closed hourly bucket: its count, the post-fold running moments,
  * and its z-score against the PRIOR hours' moments (NaN if < 2). */
final case class HourAnomaly(
    event_type: String, h: Timestamp, n: Long,
    hours: Long, sn: Long, sn2: Long, z: Double)

/** Structured Streaming forms of the event operators: the same windowed
  * aggregation as EventOps.q54 running incrementally, and stateful
  * sessionization via mapGroupsWithState.
  *
  * The reference is batch-only (SURVEY §1.1.6) — "sync" re-reads the world
  * every run. These show the incremental generalization the north star
  * asks for: a file-source stream + watermark + windowed state, which is
  * the shape that keeps state bounded on an unbounded 100 TB/day feed.
  */
object EventsStreaming {

  /** The events schema as a file-stream source requires (declared, since
    * streams cannot infer), parameterized on the fixture's physical ts
    * type — legacy TIMESTAMP(NANOS) read as raw int64, or the current
    * timestamp[us] without tz (TIMESTAMP_NTZ). See Tables.load for the
    * normalization contract both share. */
  def rawSchema(tsType: DataType = LongType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. A one-off
    * batch footer read picks the declared schema (streams cannot infer);
    * either physical form is then normalized to a session-TZ TIMESTAMP —
    * the UTC session makes the NTZ cast exact vs DuckDB's naive-as-UTC
    * read. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(dir).schema("ts").dataType
    val stream = spark.readStream.schema(rawSchema(physical)).parquet(dir)
    physical match {
      case LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Incremental form of EventOps.q54: 1-hour tumbling windows with a
    * 10-minute watermark bounding state. `sv` goes through DECIMAL(18,2)
    * like its batch twin, so the sum is order/batching-independent and
    * comparable with q54's result. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))

  /** Stateful sessionization (30-minute gap), the streaming twin of
    * EventOps.q52. State is one (sessions, lastTs, events) triple per
    * user; cumulative across micro-batches. A processing-time timeout
    * evicts idle keys so the state store stays bounded on an unbounded
    * keyspace; a timed-out key's state drops SILENTLY — its totals were
    * already emitted when last updated, so emitting again would duplicate
    * the final row in Update-mode sinks (ADVICE r01).
    *
    * Ordering contract (ADVICE r01): events are sorted by (ts, event_id)
    * WITHIN a micro-batch; across batches the source is assumed
    * near-in-order (a file feed of time-bucketed drops). An event that
    * arrives in a later batch with ts ≤ the state's lastTs merges into
    * the CURRENT session — it counts toward n_events and never opens a
    * session, so late data can undercount session splits but never
    * fabricates sessions or double-counts events. Exact out-of-order
    * session reconstruction needs event-time buffering (watermark +
    * session-window state holding per-session boundaries), which is the
    * documented upgrade path, not this operator's contract. */
  def sessionize(
      events: Dataset[Event],
      idleEvictionMs: Long = 24L * 3600 * 1000): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            sorted.foreach { e =>
              val t = e.ts.getTime
              // >= : an event exactly gap-after opens a new session, the
              // same half-open-interval boundary as session_window / q52.
              if (st.lastTs == Long.MinValue || t - st.lastTs >= gapMs)
                st = st.copy(sessions = st.sessions + 1)
              st = st.copy(lastTs = math.max(st.lastTs, t), events = st.events + 1)
            }
            state.update(st)
            state.setTimeoutDuration(idleEvictionMs)
            Iterator.single(UserSessions(uid, st.sessions, st.events))
          }
      }
  }

  /** Streaming twin of EventOps.q127 (hourly anomaly z-scores): one
    * state cell per event type holds the OPEN hourly bucket plus the
    * running moments (hours, Σn, Σn²) of every closed bucket — fixed
    * size per key, the 100 TB/day shape. When an event for a later hour
    * arrives, the open bucket closes: its count is z-scored against the
    * moments of the PRIOR closed hours (the prefix semantics — a stream
    * cannot see the future hours batch q127 uses), then folded in, and
    * the record emits with the post-fold moments so a consumer (and the
    * equivalence spec) can audit Σ exactly. z is NaN until 2 prior
    * hours exist or while σ=0. Ordering contract = sessionize's: events
    * sort by (ts, event_id) within a batch; a late event for an
    * already-closed hour merges into the OPEN bucket — it never reopens
    * history, so moments stay exact over what was counted even when
    * bucket boundaries smear. Idle types evict on processing-time
    * timeout, same silent-drop rationale as sessionize. */
  def anomalyStats(
      events: Dataset[Event],
      idleEvictionMs: Long = 24L * 3600 * 1000): Dataset[HourAnomaly] = {
    import events.sparkSession.implicits._
    val hourMs = 3600000L
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeHourState, HourAnomaly](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        case (tpe, it, state: GroupState[TypeHourState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption
              .getOrElse(TypeHourState(Long.MinValue, 0L, 0L, 0L, 0L))
            val out = scala.collection.mutable.Buffer[HourAnomaly]()
            def close(): Unit = {
              val z =
                if (st.hours >= 2) {
                  val mean = st.sn.toDouble / st.hours
                  val v = st.sn2.toDouble / st.hours - mean * mean
                  if (v > 0) (st.n.toDouble - mean) / math.sqrt(v)
                  else Double.NaN
                } else Double.NaN
              val folded = st.copy(hours = st.hours + 1,
                sn = st.sn + st.n, sn2 = st.sn2 + st.n * st.n)
              out += HourAnomaly(tpe, new Timestamp(st.hour), st.n,
                folded.hours, folded.sn, folded.sn2, z)
              st = folded
            }
            sorted.foreach { e =>
              val h = Math.floorDiv(e.ts.getTime, hourMs) * hourMs
              if (st.hour == Long.MinValue) st = st.copy(hour = h)
              else if (h > st.hour) { close(); st = st.copy(hour = h, n = 0L) }
              st = st.copy(n = st.n + 1L)
            }
            state.update(st)
            state.setTimeoutDuration(idleEvictionMs)
            out.iterator
          }
      }
  }

  /** Stream-stream interval join: each purchase joins the signups of the
    * same user within the preceding hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so the state store
    * holds only one hour (+watermark) of signups per user — the condition
    * is what lets Spark EVICT, which is the entire difference between a
    * stream-stream join that runs forever and one that OOMs. Inner join →
    * append mode; results are identical to the batch self-join twin. */
  def purchasesWithRecentSignup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(signups, expr(
      "p_user = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("s_ts"))
  }

  /** Streaming exact dedup: emit each key's FIRST arrival, with the
    * watermark bounding how long a key is remembered —
    * `dropDuplicatesWithinWatermark` drops a duplicate arriving within
    * the watermark delay of the first sighting and EVICTS the key once
    * the watermark passes it. This is the streaming twin of q44's exact
    * dedup: unbounded-keyspace dedup needs either eviction or infinite
    * state, and the watermark is the contract for which duplicates are
    * guaranteed caught (those within the delay). */
  def dedupStream(events: DataFrame, keyCol: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keyCol)

  /** Drive a stream over `dir` to completion against an in-memory sink and
    * return the materialized result (micro-batch test harness). Stateful
    * operators (mapGroupsWithState) require Update mode; pass it. */
  def runToMemory(
      spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
