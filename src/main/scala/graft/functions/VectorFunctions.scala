package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns, built
  * from codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the whole similarity pipeline stays inside whole-stage codegen
  * and is usable in any Catalyst context (filters, joins, windows).
  *
  * Determinism note: inputs are cast to ARRAY<DOUBLE> before folding;
  * `aggregate` folds left-to-right sequentially, which makes results
  * bit-reproducible across partitionings and engines (DuckDB's
  * list_cosine_similarity matches to ~1 ulp; oracle queries round to 6
  * decimals).
  *
  * Scale note: a dot product over a 64-dim array is ~64 fused multiply-adds
  * in generated code, no allocation beyond the zipped array; at 100 TB the
  * cost is dominated by the join/shuffle pattern around it (see
  * operators/Similarity.scala), not this arithmetic.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Cast any numeric array to ARRAY<DOUBLE> (float → double is exact). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Codegen'd single-loop cosine (native Catalyst expression — see
    * ArrayMathExpressions). The hot path for similarity/dedup scans. */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Higher-order-function formulations (interpreted; kept as the
    * executable spec the native expressions are asserted against). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
