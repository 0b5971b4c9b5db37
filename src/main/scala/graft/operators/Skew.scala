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
}
