package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Per-user running purchase totals on Spark 4's `transformWithState`
  * API — the successor to (flat)MapGroupsWithState: typed composable
  * state (value/list/map), TTL, timers, and a RocksDB-backed store.
  * This processor keeps ONE ValueState[(count, cents)] per user and
  * emits the post-batch running totals for every user seen in the
  * micro-batch (update-mode semantics).
  *
  * Determinism note: money is accumulated as EXACT CENTS (long), never
  * a running double — iterator order inside a batch is arbitrary, so a
  * double sum would be partition-order-dependent; integer cents commute.
  * At scale state is per-user-bounded (two longs), partitioned by the
  * grouping key across executors, and TTL (`TTLConfig`) would cap
  * abandoned users' state lifetime — the spec exercises the same
  * processor across multiple micro-batches to prove cross-batch
  * accumulation through the store.
  */
case class UserTotal(user_id: Long, n_purchases: Long, sum_cents: Long)

/** Event-time session timeout via transformWithState TIMERS — the
  * declarative replacement for the hand-rolled flatMapGroupsWithState
  * sessionizer (`Sessionize`): per-user session state plus ONE
  * registered event-time timer at (last event + gap); when the
  * WATERMARK passes the timer, `handleExpiredTimer` emits the closed
  * session and frees the state. Idle keys cost exactly one timer and
  * one small state row until their timer fires — no per-batch scan of
  * all keys, which is what makes timer-driven timeout the scale shape
  * for billions of keys. (Sessions are tracked one-at-a-time per key;
  * events inside one batch always extend the open session.) */
case class ClosedSession(user_id: Long, session_start_ms: Long,
                         session_last_ms: Long, n_events: Long)

class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Long), ClosedSession] {

  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues)
      : Iterator[ClosedSession] = {
    var (start, last, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    rows.foreach { case (_, ts) =>
      start = math.min(start, ts); last = math.max(last, ts); n += 1
    }
    // one live timer per key: re-arm the close at (last event + gap)
    getHandle.listTimers().foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(last + gapMs)
    sess.update((start, last, n))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo)
      : Iterator[ClosedSession] = {
    if (!sess.exists()) return Iterator.empty
    val (start, last, n) = sess.get()
    sess.clear()
    Iterator.single(ClosedSession(key, start, last, n))
  }
}

/** CEP-style pattern detection on ListState — for every purchase, how
  * many of the SAME user's clicks landed in the preceding window (the
  * click-burst / fraud-velocity primitive). The per-key ListState holds
  * only the clicks still inside the window behind the newest event seen
  * for that key — state is O(clicks per key per window), never O(stream).
  *
  * Determinism: iterator order inside a micro-batch is arbitrary, so the
  * batch is sorted (ts, purchases-after-clicks, id) before replay —
  * same-timestamp clicks count toward a same-timestamp purchase, the
  * e_attribution tie convention. Clicks arriving in earlier batches are
  * in state and count across batches (spec-proved); this runs
  * TimeMode.None with self-GC off the key's max seen event time — the
  * long-running deployment swaps in TimeMode.EventTime + watermark GC,
  * the SessionTimeoutProcessor pattern. */
case class BurstHit(user_id: Long, purchase_id: Long,
                    n_recent_clicks: Long)

class ClickBurstProcessor(windowMs: Long)
    extends StatefulProcessor[Long, (Long, Long, String, Long), BurstHit] {

  @transient private var clicks: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    clicks = getHandle.getListState[Long]("clicks", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
                               rows: Iterator[(Long, Long, String, Long)],
                               timers: TimerValues): Iterator[BurstHit] = {
    val evs = rows.toArray.sortBy(r => (r._2, r._3 == "purchase", r._4))
    var recent = clicks.get().toArray
    val hits = Array.newBuilder[BurstHit]
    var maxTs = Long.MinValue
    evs.foreach { case (_, ts, typ, id) =>
      maxTs = math.max(maxTs, ts)
      if (typ == "click") recent :+= ts
      else if (typ == "purchase")
        hits += BurstHit(key, id,
          recent.count(c => c <= ts && c > ts - windowMs))
    }
    // GC: only clicks that can still fall in a future purchase's window
    // survive (events per key are near-monotone; the event-time variant
    // GCs on the watermark instead). The store rejects empty list
    // writes — an emptied window clears the state row instead.
    val kept = recent.filter(_ > maxTs - windowMs)
    if (kept.isEmpty) clicks.clear() else clicks.put(kept)
    hits.result().iterator
  }
}

/** Per-user modal event type on MapState — completes the state-type
  * matrix (ValueState: RunningTotalProcessor, ListState:
  * ClickBurstProcessor). The map holds one counter per (user, type);
  * each batch bumps the touched counters POINTWISE (updateValue per
  * key — never a read-modify-write of the whole map, which is what
  * keeps a million-type key affordable in RocksDB) and re-emits the
  * user's current leader. Integer counts commute, so batch-internal
  * iterator order is irrelevant; ties break to the lexicographically
  * smallest type for engine-portable determinism. */
case class TypeLeader(user_id: Long, top_type: String, n_top: Long,
                      n_events: Long)

class TypeLeaderProcessor
    extends StatefulProcessor[Long, (Long, String), TypeLeader] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                               timers: TimerValues): Iterator[TypeLeader] = {
    rows.foreach { case (_, typ) =>
      val cur = if (counts.containsKey(typ)) counts.getValue(typ) else 0L
      counts.updateValue(typ, cur + 1L)
    }
    var total = 0L
    var best: (String, Long) = (null, 0L)
    counts.iterator().foreach { case (typ, n) =>
      total += n
      if (n > best._2 || (n == best._2 && (best._1 == null ||
        typ < best._1))) best = (typ, n)
    }
    Iterator.single(TypeLeader(key, best._1, best._2, total))
  }
}

class RunningTotalProcessor
    extends StatefulProcessor[Long, (Long, Long), UserTotal] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues): Iterator[UserTotal] = {
    var n = 0L
    var cents = 0L
    if (totals.exists()) {
      val prev = totals.get()
      n = prev._1
      cents = prev._2
    }
    rows.foreach { r => n += 1; cents += r._2 }
    totals.update((n, cents))
    Iterator.single(UserTotal(key, n, cents))
  }
}
