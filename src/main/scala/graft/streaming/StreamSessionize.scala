package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (beyond-reference, SURVEY §2.10): the
  * streaming twin of [[graft.ops.LlmData.sessionize]] — gap-based sessions
  * over an event stream via flatMapGroupsWithState with event-time timeout —
  * plus a watermarked tumbling-window aggregate.
  *
  * Scale design: state is one small [[SessionState]] per active user key
  * (partitioned by user_id across the cluster, checkpointed by the state
  * store); the watermark bounds state growth — users idle past
  * watermark+gap are timed out and their session emitted, so state size
  * tracks ACTIVE users, not history.
  */
object StreamSessionize {

  final case class Event(event_id: Long, user_id: Long, ts: Timestamp,
                         event_type: String, value: Double)
  final case class SessionState(start: Timestamp, last: Timestamp, n: Long)
  final case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp,
                              n_events: Long, closed_by_timeout: Boolean)

  /** Gap-based streaming sessionization. Emits a session when a newer event
    * for the same user arrives more than `gapSeconds` later (closed by
    * gap), or when the watermark passes last+gap with no new events
    * (closed by timeout).
    */
  def sessionize(events: Dataset[Event],
                 gapSeconds: Long = 1800,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000

    def update(user: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(user, s.start, s.last, s.n, closed_by_timeout = true))
      } else {
        // per-key per-batch events: sort by event time (bounded by batch
        // size, not stream size)
        val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          cur = cur match {
            case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
              Some(SessionState(s.start, e.ts, s.n + 1))
            case Some(s) =>
              closed ::= SessionOut(user, s.start, s.last, s.n, closed_by_timeout = false)
              Some(SessionState(e.ts, e.ts, 1))
            case None =>
              Some(SessionState(e.ts, e.ts, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last.getTime + gapMs)
        }
        closed.reverse.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact dedup on a key column within the watermark horizon:
    * the streaming tier of the dedup ladder (exact → fingerprint →
    * MinHash). State holds one entry per key seen inside the watermark
    * window and is evicted as the watermark advances — bounded state, the
    * only viable exact-dedup shape on an unbounded stream. */
  def dedupStream(events: DataFrame,
                  keyCols: Seq[String] = Seq("event_id"),
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked tumbling-window counts per event type — the canonical
    * streaming aggregate (late data beyond the watermark dropped, state
    * evicted per closed window). */
  def windowedCounts(events: DataFrame,
                     windowLength: String = "10 minutes",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))
}
