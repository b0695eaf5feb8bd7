package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (event-time in `ts`). */
case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Open-session state tracked per user between micro-batches. */
case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)

/** Emitted when a session closes (gap exceeded / timeout fired). */
case class SessionClosed(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

/**
 * Structured Streaming counterparts of the batch operators: the group-sorted
 * per-key streaming semantics carry over to unbounded data via watermarks and
 * keyed state (`flatMapGroupsWithState`) — the 100 TB/day ingestion shape.
 */
object StreamOps {

  /**
   * Event-time sessionization with a gap timeout, as a stateful streaming op.
   * Emits one row per CLOSED session; open sessions close via event-time
   * timeout once the watermark passes lastSeen + gap.
   */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long, watermarkDelay: String = "10 minutes"): Dataset[SessionClosed] = {
    val spark = events.sparkSession
    import spark.implicits._

    def updateState(userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionState]): Iterator[SessionClosed] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(SessionClosed(userId, s.sessionStart, s.lastSeen, s.nEvents))
      }
      val times = batch.map(_.ts.getTime).toArray.sorted
      var closed = List.empty[SessionClosed]
      var cur = state.getOption
      times.foreach { t =>
        cur match {
          case Some(s) if t >= s.lastSeen && t - s.lastSeen <= gapMs =>
            cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1))
          case Some(s) if t < s.lastSeen =>
            // late event (prior batch's watermark admitted it): absorb only if
            // within gap of the open session's span, extending its start
            // backward — a naive `t - lastSeen <= gap` is negative and would
            // swallow ANY late event into the wrong session
            if (t >= s.sessionStart - gapMs)
              cur = Some(s.copy(sessionStart = math.min(s.sessionStart, t), nEvents = s.nEvents + 1))
            else
              closed ::= SessionClosed(userId, t, t, 1) // too old to join anything
          case Some(s) =>
            closed ::= SessionClosed(userId, s.sessionStart, s.lastSeen, s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastSeen + gapMs)
        case None => // no events and no timeout: nothing to do
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }

  /**
   * Streaming exact dedup: drop events whose key columns repeat within the
   * watermark horizon — the streaming analog of `Dedup.exact`. State is
   * bounded by the watermark (old keys age out), which is what makes exact
   * dedup feasible on an unbounded 100 TB/day stream.
   */
  def dedupWithinWatermark(events: Dataset[StreamEvent], keyCols: Seq[String],
                           watermarkDelay: String = "10 minutes"): Dataset[StreamEvent] = {
    require(keyCols.nonEmpty,
      "dedupWithinWatermark needs at least one key column (an empty list would collapse the stream to one row)")
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Sliding-window event counts per type with a watermark for late data —
    * the streaming analog of the batch groupBy/agg layer. */
  def windowedCounts(events: Dataset[StreamEvent], window: String, slide: String, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
