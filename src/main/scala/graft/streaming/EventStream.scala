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

  /** Convenience: run a streaming frame into a named memory sink until all
    * available input is processed (test/bench harness path).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }
}
