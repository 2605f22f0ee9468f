package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming ingest for the `events` table — an extension beyond
  * the reference surface (its query API is batch-only; CDC/Debezium is
  * topology the planner reasons about, SURVEY.md §2.10). This module gives
  * the engine a streaming path with the standard scale features: watermarked
  * windowed aggregation (bounded state, late-data tolerance) and custom
  * session state via flatMapGroupsWithState.
  *
  * Local testing drives it with the file source over the testdata parquet +
  * a memory sink (`processAllAvailable`); on a cluster the same plan reads
  * Kafka/files and writes any sink — the transformations are source-agnostic.
  */
object EventStream {

  /** The testdata stores `ts` as parquet timestamp[us] without a timezone;
    * requesting TimestampType in the read schema makes Spark interpret the
    * naive micros in the session timezone (UTC everywhere in this project),
    * which is what the watermark/window machinery needs.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files.
    *
    * Requires `spark.sql.session.timeZone = UTC` (the guard-before-use
    * convention, ADVICE r10): the schema reads NAIVE parquet micros as
    * TimestampType, so a non-UTC session would silently shift every
    * event time — and with it every window boundary and watermark cut.
    * Raising here turns that silent corruption into an immediate error;
    * Bench/Verify/TestSpark already pin UTC.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"EventStream.read: session timezone is '$tz', not UTC — naive event " +
        "micros would be silently shifted; set spark.sql.session.timeZone=UTC")
    spark.readStream.schema(eventSchema).parquet(dir)
  }

  /** Watermarked tumbling-window aggregation: events and value sums per
    * (window, event_type). The 10-minute watermark bounds state: windows
    * older than max(ts)-10min are finalized and dropped — the property that
    * keeps state finite on an unbounded 100 TB/day stream.
    */
  def windowedCounts(events: DataFrame,
      window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("totalValue"))

  final case class SessionState(
      nEvents: Long, totalValue: Double, start: Timestamp, last: Timestamp)

  final case class SessionOut(
      userId: Long, nEvents: Long, totalValue: Double,
      startTs: Timestamp, endTs: Timestamp, durationSec: Long)

  /** Custom session windows via flatMapGroupsWithState: a session closes
    * after `gapMs` of inactivity (processing-time timeout); one output row
    * per closed session. State is one small record per active user —
    * the mapGroupsWithState pattern the reference has no analogue for.
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.nEvents, s.totalValue, s.start, s.last,
              (s.last.getTime - s.start.getTime) / 1000))
          } else {
            val evs = rows.toSeq
            val prev = state.getOption
            val start = prev.map(_.start).getOrElse(evs.map(_._2).min)
            val last = (prev.map(_.last).toSeq ++ evs.map(_._2)).max
            val next = SessionState(
              prev.map(_.nEvents).getOrElse(0L) + evs.size,
              prev.map(_.totalValue).getOrElse(0.0) + evs.map(_._3).sum,
              start, last)
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Iterator.empty
          }
      }
  }

  final case class TransEvt(user_id: Long, event_id: Long, tsSec: Long,
    event_type: String)
  final case class TransState(tsSec: Long, event_id: Long, event_type: String)
  final case class TransPair(user_id: Long, prev_type: String, next_type: String)

  /** Streaming event-type transitions — the per-pair feed of the batch
    * `q20_transitions` Markov card: state = each user's LAST event (one
    * tiny record per user), each arriving batch sorts ITS group rows by
    * `(tsSec, event_id)` and emits the consecutive pairs, chaining
    * through the stored last event. Under time-ordered arrival (the
    * event-log norm — a log is replayed/ingested in order) the emitted
    * pair multiset equals the batch lag-window pairing exactly
    * (parity-pinned); late events would pair against the newest state,
    * the documented processing-order semantics of a one-record state.
    * A downstream count/normalize over the pair stream reproduces the
    * card.
    */
  def runningTransitions(events: DataFrame): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_seconds(col("ts").cast("timestamp")).as("tsSec"),
        col("event_type"))
      .as[TransEvt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsSec, e.event_id))
          val types = state.getOption.map(_.event_type).toSeq ++
            sorted.map(_.event_type)
          val last = sorted.last
          state.update(TransState(last.tsSec, last.event_id, last.event_type))
          types.sliding(2).collect {
            case Seq(a, b) => TransPair(uid, a, b)
          }
      }
  }

  final case class FunnelEvt(user_id: Long, tsSec: Long, event_type: String)
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelOut(user_id: Long, t1: Long, t2: Long, t3: Long)

  /** Streaming first-touch funnel — per user, the running
    * (first view, first click-after-view, first purchase-after-click)
    * second-floored times (−1 = step not reached), one small state record
    * per user, one output row per user per batch (update mode; consumers
    * keep the latest). Under time-ordered arrival (same-second events
    * not split across micro-batches) the final emits equal
    * the batch `q18_funnel` chain exactly (parity-pinned): each step's
    * time only ever moves from −1 to its first qualifying event, and in
    * arrival order that IS the batch min-after-previous-touch. The
    * step-count card is one aggregate over the latest emits.
    */
  def runningFunnel(events: DataFrame): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"),
        unix_seconds(col("ts").cast("timestamp")).as("tsSec"),
        col("event_type"))
      .as[FunnelEvt]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          // within a batch, order same-second events by STEP RANK: the
          // batch chain accepts a click at tsSec == t1 (>=), so the view
          // must be applied first or an equal-second click would be lost
          def rank(t: String) = t match {
            case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => 3
          }
          rows.toSeq.sortBy(e => (e.tsSec, rank(e.event_type))).foreach { e =>
            st = e.event_type match {
              case "view" if st.t1 < 0 => st.copy(t1 = e.tsSec)
              case "click" if st.t2 < 0 && st.t1 >= 0 && e.tsSec >= st.t1 =>
                st.copy(t2 = e.tsSec)
              case "purchase" if st.t3 < 0 && st.t2 >= 0 && e.tsSec >= st.t2 =>
                st.copy(t3 = e.tsSec)
              case _ => st
            }
          }
          state.update(st)
          FunnelOut(uid, st.t1, st.t2, st.t3)
      }
  }

  /** Convenience: run a streaming frame into a named memory sink until all
    * available input is processed (test/bench harness path).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }
}
