package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Bloom-filter sketch surface over Spark's built-in
  * BloomFilterAggregate / BloomFilterMightContain expressions — the same
  * machinery Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter) injects, exposed for
  * explicit use where the optimizer can't see the opportunity (e.g. a
  * semi-join whose build side comes from a separate pipeline stage).
  *
  * 100 TB shape: the build side is aggregated into a few-KB..MB binary
  * sketch (one pass, partial-merged), which then rides the plan as a
  * LITERAL — the probe side filters map-side with zero shuffle and only
  * the surviving (probable-match) rows pay the exact-join shuffle. False
  * positives are eliminated by the exact join that follows, so results
  * are identical to the plain join; the sketch only sheds rows early.
  */
object SketchFunctions {

  /** Aggregate column: bloom filter (binary) over xxhash64(keys). */
  def bloomAgg(keys: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(xxhash64(keys)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Build the sketch now: one tiny job, returns the serialized filter
    * (the only driver-side value — a sketch, not data rows). */
  def buildBloom(build: DataFrame, key: Column,
                 expectedItems: Long, numBits: Long): Array[Byte] =
    build.agg(bloomAgg(key, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Membership probe of `key` against a pre-built sketch literal. An
    * empty build side yields a NULL sketch from BloomFilterAggregate
    * (buildBloom returns null); the empty set has no members, so the
    * probe is constant-false rather than a NullType literal that fails
    * BloomFilterMightContain's analysis. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) org.apache.spark.sql.functions.lit(false)
    else column(BloomFilterMightContain(Literal(bloom),
      expression(xxhash64(key))))

  /** Count-min sketch over a key column (Spark's built-in
    * `count_min_sketch` aggregate; fixed seed for reproducibility):
    * one pass, few-KB binary, answers "how often does key k appear"
    * with one-sided error ≤ eps·N at confidence `conf` — the
    * heavy-hitter / frequency primitive that replaces a full groupBy
    * when only approximate per-key counts are needed. */
  def cmsAgg(key: Column, eps: Double = 0.001, conf: Double = 0.99,
             seed: Int = 42): Column =
    org.apache.spark.sql.functions.count_min_sketch(
      key, org.apache.spark.sql.functions.lit(eps),
      org.apache.spark.sql.functions.lit(conf),
      org.apache.spark.sql.functions.lit(seed))

  /** Build the sketch now and return the driver-side probe handle. */
  def buildCms(build: DataFrame, key: Column, eps: Double = 0.001,
               conf: Double = 0.99): org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      build.agg(cmsAgg(key, eps, conf).as("cms"))
        .head().getAs[Array[Byte]](0))
}
