package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * flatMapGroupsWithState — the KeyValueGroupedDataset state API the
  * north-star calls for (SURVEY.md §2.10 stretch).
  *
  * State per user is ONE open session (constant size); a session is
  * emitted when a gap larger than `gapSec` arrives or the group's
  * processing-time timeout fires. Event-time ordering within a batch is
  * restored by sorting the group's iterator — correct under
  * Trigger.AvailableNow where each user's events arrive within few
  * batches; a production deployment would pair this with a watermark to
  * bound reordering.
  *
  * The batch gap-island formulation of the same semantics is
  * `w5_sessionize` (ExtendedOps) — StreamingSpec asserts the two agree
  * on the testdata.
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, tsMicros: Long)
  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  def sessionsOf(gapSec: Long, useTimeout: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val gapUs = gapSec * 1000000L
    val sorted = events.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsMicros - s.endUs <= gapUs =>
          open = Some(s.copy(endUs = e.tsMicros, n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.startUs, s.endUs, s.n)
          open = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
        case None =>
          open = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
      }
    }
    open match {
      case Some(s) if state.hasTimedOut =>
        closed += Session(userId, s.startUs, s.endUs, s.n)
        state.remove()
      case Some(s) =>
        state.update(s)
        if (useTimeout) state.setTimeoutDuration(gapSec * 1000)
      case None => ()
    }
    closed.result().iterator
  }

  /** Streamed sessions. With `useTimeout=true` idle groups flush their
    * open session via ProcessingTimeTimeout (a long-running deployment's
    * mode — the engine then schedules periodic timeout batches); the
    * default NoTimeout mode closes sessions on gap arrival only, which is
    * the deterministic choice for finite replays/tests. */
  def run(spark: SparkSession, events: Dataset[Event], gapSec: Long = 1800,
          useTimeout: Boolean = false): Dataset[Session] = {
    import spark.implicits._
    val timeoutConf = if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        sessionsOf(gapSec, useTimeout))
  }
}
