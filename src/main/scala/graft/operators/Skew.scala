package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7 M4 / README "skew awareness").
  *
  * AQE's skew-join handling covers joins, but a groupBy on a key whose
  * top value owns a large fraction of all rows still funnels that key's
  * rows through one reducer. `saltedAgg` is the standard two-phase
  * rewrite: aggregate on (key, salt) first — spreading the hot key over
  * `buckets` reducers — then combine the partials per key. Works for any
  * algebraic aggregate (sum/count/min/max and anything mergeable, e.g.
  * the decimal-exact sums from graft.Sql).
  */
object Skew {

  /** Two-phase salted aggregation: `partials` computes per-(key, salt)
    * partial aggregates; `combine` merges partials per key. The salt is
    * derived from a uniform hash of the full row id space (deterministic
    * given the input), not rand(), so replays reproduce. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, buckets: Int,
                partials: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(combine.head, combine.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Salted equi-join for a SKEWED left side against a right side too
    * big to broadcast: the left's hot keys are spread over `buckets`
    * reducers by a deterministic salt, the right side is replicated
    * `buckets`× (explode), and the join runs on (key, salt). Join
    * cardinality is unchanged — each left row still meets each matching
    * right row exactly once (at its own salt) — so results are
    * identical to the plain join; only the partitioning changes. The
    * portable form of AQE's skew-join splitting, usable when the skew
    * is known ahead of time or AQE can't see it (e.g. bucketed inputs,
    * storage-partitioned joins). */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 saltSource: Column, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val r = right.withColumn("__salt_r",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, leftKey === rightKey && col("__salt") === col("__salt_r"))
      .drop("__salt", "__salt_r")
  }
}
