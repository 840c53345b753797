package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native argmax/argmin over a packed centroid/codebook array — the
  * last interpreted piece of the assignment path. The relational form
  * (`array_max(transform(cs, c -> struct(score, ±id)))`) is exact but
  * runs the lambda through Spark's CodegenFallback higher-order
  * machinery: one interpreter frame per entry per row. These statics
  * run the same [[VectorOps]] kernels in a primitive loop and
  * replicate the same ordering:
  *
  *   - scores compare with Spark's SQL double ordering
  *     (SQLOrderingUtil: NaN greatest, -0.0 == 0.0) — identical to
  *     the struct comparison array_max/min performed;
  *   - exact score ties break to the LOWEST entry id, matching
  *     (sim, -id) max / (d2, id) min.
  *
  * Entries are struct<c_id: bigint, c_vec: array<float>> rows of the
  * broadcast-class packed relation; an empty array fails loudly
  * (the packed centroid set is non-empty by construction).
  */
object NearestOps {

  /** argmax of cosine(v, entry): highest sim, ties → lowest id. */
  def nearestCosineF(cs: ArrayData, v: ArrayData): Long = {
    val n = cs.numElements()
    require(n > 0, "empty centroid array")
    var bestId = 0L
    var bestSim = 0.0
    var i = 0
    while (i < n) {
      val e = cs.getStruct(i, 2)
      val id = e.getLong(0)
      val sim = VectorOps.cosineF(v, e.getArray(1))
      val cmp = SQLOrderingUtil.compareDoubles(sim, bestSim)
      if (i == 0 || cmp > 0 || (cmp == 0 && id < bestId)) {
        bestSim = sim; bestId = id
      }
      i += 1
    }
    bestId
  }

  /** argmin of |c|² − 2·v·c (the rank-equivalent L2 form): lowest
    * partial distance, ties → lowest id.
    */
  def nearestL2F(cs: ArrayData, v: ArrayData): Long = {
    val n = cs.numElements()
    require(n > 0, "empty codebook array")
    var bestId = 0L
    var bestD2 = 0.0
    var i = 0
    while (i < n) {
      val e = cs.getStruct(i, 2)
      val id = e.getLong(0)
      val c = e.getArray(1)
      val d2 = VectorOps.dotF(c, c) - 2.0 * VectorOps.dotF(v, c)
      val cmp = SQLOrderingUtil.compareDoubles(d2, bestD2)
      if (i == 0 || cmp < 0 || (cmp == 0 && id < bestId)) {
        bestD2 = d2; bestId = id
      }
      i += 1
    }
    bestId
  }
}

/** Native Catalyst expression: nearest entry id under the given
  * metric ("cosine" maximizes cosine; "l2" minimizes |c|²−2·v·c).
  */
case class NearestIdExpr(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {
  require(metric == "cosine" || metric == "l2", s"metric $metric")
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_nearest_$metric"

  private def method: String =
    if (metric == "cosine") "nearestCosineF" else "nearestL2F"

  override protected def nullSafeEval(cs: Any, v: Any): Any =
    if (metric == "cosine")
      NearestOps.nearestCosineF(cs.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])
    else
      NearestOps.nearestL2F(cs.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cs, v) => s"graft.functions.NearestOps.$method($cs, $v)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestIdExpr =
    copy(left = l, right = r)
}
