package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Rewrite `variant_get(v, '$.key', type)` onto the table's SHREDDED
  * shadow column — the optimizer half of GDX variant shredding (the
  * write half derives the shadow at every write; see
  * `GdxSource.withShred`).
  *
  * A GDX table may declare a column GENERATED from a top-level key of
  * a sibling variant column (`gdx.shred.<col> = '<variant>:<key>'`).
  * The shadow is a real stored column with ordinary zone-map stats
  * (truncated string bounds included), so once a variant_get call is
  * rewritten onto it, everything downstream is stock machinery: the
  * predicate pushes as a plain column filter, planning SKIPS files by
  * the shadow's per-file bounds, and the row-level evaluation reads a
  * typed cell instead of parsing JSON. `SELECT ... WHERE
  * variant_get(meta, '$.lang', 'string') = 'uk'` over a 100 TB corpus
  * reads proportionally to the slice — the Parquet variant-shredding
  * contract, re-expressed for this format.
  *
  * Scope and safety:
  *  - fires only where BOTH the variant attribute and its shadow are
  *    present in the SAME child output (attribute identity by exprId,
  *    so a self-join's two table instances can never cross-wire);
  *  - requires exact (path, target type) match with the declaration;
  *  - rewrites `variant_get` and `try_variant_get` alike: the stored
  *    shadow was derived with try-semantics (NULL on an uncastable
  *    value), so on any row that entered through the writer the two
  *    calls agree except where strict variant_get would have ERRORED —
  *    the rewrite trades that error for the stored NULL, the same
  *    trade Spark's own shredded-Parquet reads make.
  *
  * Reference analogue: the reference keeps ragged per-record metadata
  * in free-form columns and filters on extracted fields
  * (`/root/reference/src/analyze.py:20-109`); this tier makes such
  * filters plan at metadata cost instead of full-scan cost. */
object GdxShredRewrite extends Rule[LogicalPlan] {
  private val OfKey  = "gdxShredOf"
  private val KeyKey = "gdxShredKey"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case n if n.children.nonEmpty &&
          n.children.exists(_.output.exists(
            _.metadata.contains(OfKey))) =>
        n.transformExpressions {
          case vg @ VariantGet(src: AttributeReference,
              Literal(p: UTF8String, StringType), t, _, _) =>
            // the child whose output carries the variant attr is the
            // only legal scope for its shadow
            n.children.iterator
              .map(_.output)
              .find(_.exists(_.exprId == src.exprId))
              .flatMap(_.collectFirst {
                case a: AttributeReference
                    if a.metadata.contains(OfKey) &&
                      a.metadata.getString(OfKey)
                        .equalsIgnoreCase(src.name) &&
                      "$." + a.metadata.getString(KeyKey) == p.toString &&
                      a.dataType == t =>
                  a: Expression
              })
              .getOrElse(vg)
        }
    }
}
