package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table. The reference is
  * batch-only (its job blocks on completion, `MapRedWord2Vec.scala:282`),
  * so this is engine-surface beyond parity: the same event analytics the
  * batch queries compute (q21 daily windows, q25 sessionization),
  * expressed as incremental streaming plans.
  *
  * Scale design: windowed aggregation state is bounded by the watermark
  * (late data beyond 1 hour is dropped and state evicted); session state
  * is per-key and expires via processing-time timeout. Both operators
  * shuffle once on their grouping key per micro-batch — the streaming
  * analogues of the batch plans' single-exchange shapes.
  */
object EventStream {

  /** The events schema as the file stream source needs it declared.
    * ts arrives as raw int64 nanos (see Tables.events) and is rebuilt
    * into a microsecond timestamp. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events parquet path as a file stream. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)")) // integer div: see Tables.events
  }

  /** Tumbling daily windows per event type with a 1-hour watermark —
    * the streaming twin of the batch q21. */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(lastTsMicros: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom state machine via flatMapGroupsWithState: per-user session
    * counting with a 30-minute gap rule — the streaming twin of the
    * batch q25 window query. State is one small record per active user,
    * evicted after an hour of silence. */
  def sessionCounts(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSessions(userId, s.sessions, s.events))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val tsMicros = e.ts.getTime * 1000L
              val newSession = s.lastTsMicros == Long.MinValue ||
                tsMicros - s.lastTsMicros > 30L * 60 * 1000 * 1000
              s = SessionState(tsMicros,
                s.sessions + (if (newSession) 1 else 0), s.events + 1)
            }
            state.update(s)
            state.setTimeoutDuration("1 hour")
            Iterator.empty
          }
        })
  }
}
