package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native probe of a pre-built count-min sketch: estimateCount(key) as a
  * codegen'd narrow map over a LONG key column. The few-KB sketch bytes
  * ride the plan as a reference object and deserialize ONCE per executor
  * (lazily, into generated-class state), so probing a key dictionary is
  * shuffle-free and broadcast-free — the shape that lets a frequency
  * ranking run over a 100 TB-derived dictionary without ever building
  * the full exact aggregate. */
case class CmsEstimate(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs a BIGINT key, got ${child.dataType.catalogString}")

  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))

  override def nullSafeEval(k: Any): Any =
    cms.estimateCount(k.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cmsClass = "org.apache.spark.util.sketch.CountMinSketch"
    val bytesRef = ctx.addReferenceObj("cmsBytes", sketch, "byte[]")
    val field = ctx.addMutableState(cmsClass, "cmsSketch")
    nullSafeCodeGen(ctx, ev, c => s"""
       |if ($field == null) {
       |  try {
       |    $field = $cmsClass.readFrom(new java.io.ByteArrayInputStream($bytesRef));
       |  } catch (java.io.IOException e) { throw new RuntimeException(e); }
       |}
       |${ev.value} = $field.estimateCount((Object) $c);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

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

  /** Build the sketch now and return its serialized bytes (the plan-side
    * currency: feed to `cmsEstimate` / `CountMinSketch.readFrom`). */
  def buildCmsBytes(build: DataFrame, key: Column, eps: Double = 0.001,
                    conf: Double = 0.99): Array[Byte] =
    build.agg(cmsAgg(key, eps, conf).as("cms"))
      .head().getAs[Array[Byte]](0)

  /** Build the sketch now and return the driver-side probe handle. */
  def buildCms(build: DataFrame, key: Column, eps: Double = 0.001,
               conf: Double = 0.99): org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(buildCmsBytes(build, key, eps, conf)))

  /** Executor-side estimateCount of `key` (BIGINT) against the sketch —
    * see [[CmsEstimate]]. */
  def cmsEstimate(sketch: Array[Byte], key: Column): Column =
    column(CmsEstimate(expression(key), sketch))
}
