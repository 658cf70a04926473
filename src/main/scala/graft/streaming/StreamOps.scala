package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming shapes of the engine's event-table operators:
  * the same tumbling-window aggregation the batch query `ev_hourly_window`
  * computes, expressed over a stream with a watermark so state is bounded
  * on an unbounded 100 TB-scale feed. The batch and streaming plans share
  * this one definition — parity between them is tested by running the
  * stream over the same parquet input with `processAllAvailable`.
  */
object StreamOps extends Serializable {

  /** Tumbling-window counts/sums per event type. Works on a batch OR
    * streaming DataFrame with columns (ts: timestamp, event_type, value).
    */
  def hourlyAgg(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Streaming exact dedup: first occurrence per key within the
    * watermark horizon (state for a key is droppable once the watermark
    * passes it — bounded state on an unbounded feed). Works on batch
    * DataFrames too, where it degenerates to plain dropDuplicates.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     tsCol: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserSession(user_id: Long, session_start: String,
                               n_events: Long, sum_value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)

  // thread-safe, rebuilt on executors after deserialization
  @transient private lazy val fmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)

  /** Batch sessionization: per-user sessions split at > gapMinutes idle,
    * via lag + running sum of boundary flags (all window functions, no
    * state). Session identity is order-stable: tied timestamps have a
    * zero gap and can never open a session.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapMs = gapMinutes * 60L * 1000L
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession =
      when(prev.isNull, 1)
        .when(unix_millis(col("ts")) - unix_millis(prev) > gapMs, 1)
        .otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .drop("sid")
  }

  /** Streaming sessionization: the same sessions over an unbounded feed
    * via `flatMapGroupsWithState` with event-time timeout — per-user
    * state is one open session (constant memory per key), closed and
    * emitted when the watermark passes its gap.
    */
  def sessionizeStream(events: Dataset[UserEvent],
                       gapMinutes: Int): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, evs: Iterator[UserEvent],
               state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[UserSession]
      var cur = state.getOption
      if (state.hasTimedOut) {
        cur.foreach(s => closed ::= finish(userId, s))
        state.remove()
        cur = None
      }
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            cur = Some(SessionState(s.startMs, math.max(s.lastMs, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed ::= finish(userId, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.reverseIterator
    }

    def finish(userId: Long, s: SessionState): UserSession =
      UserSession(userId, fmt.format(java.time.Instant.ofEpochMilli(s.startMs)),
        s.n, math.rint(s.sum * 1e4) / 1e4)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
