package graft.ts

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming inactivity-gap sessionization over Structured Streaming.
  *
  * The batch rewrite in [[TimeOps.sessionize]] needs the whole history per
  * key; a stream cannot have that, so this is the stateful counterpart:
  * `flatMapGroupsWithState` keeps ONE open session per key (four longs of
  * state — start, end, count, value sum), extends it while events arrive
  * within `gapSeconds`, and emits a session exactly once, when it closes:
  * either a later event opens the next session, or the event-time timeout
  * fires once the watermark passes `session_end + gap` and no extension can
  * ever arrive. State size is O(active keys), independent of stream length
  * — the 100-TB-of-events shape. Late events beyond the watermark are
  * dropped by Spark before the function runs (standard watermark
  * semantics); late-but-within-watermark events that cannot extend the open
  * session (they precede it by more than the gap) are emitted immediately
  * as single-event sessions rather than corrupting the open one.
  */
object StreamSessionize extends Serializable {

  /** One input event; `ts` must be the event-time column the watermark is
    * defined on. */
  case class Event(key: Long, ts: Timestamp, value: Double)

  /** Open-session state, micros since epoch (Timestamps don't encode as
    * compactly and state stores per key are the scale constraint). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sumValue: Double)

  /** A closed session. */
  case class Session(key: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def ts(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  /** Sessionize a stream of [[Event]]s. `events` must be a streaming
    * Dataset; the caller picks the watermark delay (how much event-time
    * lateness to tolerate before a session is finalized).
    */
  def apply(events: Dataset[Event], gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def fn(key: Long, batch: Iterator[Event],
        state: GroupState[OpenSession]): Iterator[Session] = {
      def close(s: OpenSession) =
        Session(key, ts(s.startUs), ts(s.endUs), s.n, s.sumValue)

      if (batch.isEmpty && state.hasTimedOut) {
        // Watermark passed end+gap: nothing can extend this session.
        val out = state.getOption.map(close).toList
        state.remove()
        return out.iterator
      }

      val closed = List.newBuilder[Session]
      var open = state.getOption
      // Within a microbatch arrival order is arbitrary — sort by event time.
      batch.toSeq.sortBy(e => us(e.ts)).foreach { e =>
        val t = us(e.ts)
        open match {
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
          case Some(s) if t >= s.startUs - gapUs && t <= s.endUs + gapUs =>
            open = Some(OpenSession(math.min(s.startUs, t), math.max(s.endUs, t),
              s.n + 1L, s.sumValue + e.value))
          case Some(s) if t > s.endUs + gapUs =>
            closed += close(s)
            open = Some(OpenSession(t, t, 1L, e.value))
          case Some(_) =>
            // Older than the open session by more than the gap: its session
            // already closed (or never existed). Emit as a singleton rather
            // than rewriting history.
            closed += Session(key, e.ts, e.ts, 1L, e.value)
        }
      }
      open.foreach { s =>
        state.update(s)
        // Fire once no in-watermark event can extend the session. Spark
        // requires the timeout to sit beyond the current watermark; the
        // open session's end is >= watermark by construction (older events
        // never reach the function), so end + gap qualifies.
        state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** DataFrame adapter: expects `key: long, ts: timestamp, value: double`
    * columns (rename/cast upstream). */
  def onFrame(df: DataFrame, gapSeconds: Long, watermarkDelay: String): Dataset[Session] = {
    import df.sparkSession.implicits._
    apply(df.select(col("key").cast("long").as("key"), col("ts"),
      col("value").cast("double").as("value")).as[Event], gapSeconds, watermarkDelay)
  }
}
