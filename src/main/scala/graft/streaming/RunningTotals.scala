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
