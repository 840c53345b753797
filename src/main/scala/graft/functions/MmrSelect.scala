package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein,
  * SIGIR 1998): greedily pick k items maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s)` — relevance traded against
  * redundancy with what's already selected. The diversified-retrieval
  * step a training-data pipeline runs AFTER nearest-neighbor
  * retrieval: plain top-k happily returns k near-copies of the same
  * document; MMR returns the query's neighborhood's distinct modes.
  *
  * Determinism: candidates are canonicalized to (rel desc, id asc)
  * order before the greedy loop regardless of arrival order (so the
  * surrounding collect_list's nondeterministic gather order cannot
  * leak into results), and score ties resolve to that canonical
  * order. The first pick's score is λ·rel (max over the empty
  * selection taken as 0) — and because maxSim starts at 0 and only
  * ever rises, the redundancy term is FLOORED AT 0 for every pick:
  * an all-negative neighborhood counts as no redundancy, never as a
  * bonus (the DuckDB oracle mirrors this with greatest(0, max(...))).
  */
object MmrOps {
  def select(cands: ArrayData, k: Int, lambda: Double): ArrayData = {
    val n = cands.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 3)
      ids(i) = r.getLong(0)
      rels(i) = r.getDouble(1)
      vecs(i) = r.getArray(2).copy()
      i += 1
    }
    val order = Array.range(0, n).sortBy(j => (-rels(j), ids(j)))
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Double](n)
    val out = new Array[Any](math.min(k, n))
    var picks = 0
    while (picks < out.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      for (j <- order if !taken(j)) {
        val sc = lambda * rels(j) - (1 - lambda) * maxSim(j)
        if (sc > bestScore) { best = j; bestScore = sc }
      }
      taken(best) = true
      out(picks) = InternalRow(ids(best), bestScore)
      for (j <- order if !taken(j)) {
        val s = VectorOps.cosineF(vecs(j), vecs(best))
        if (s > maxSim(j)) maxSim(j) = s
      }
      picks += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: MmrSelect(array<struct<id: long, rel: double,
  * vec: array<float>>>) → array<struct<id, mmr>> in selection order.
  * CodegenFallback is deliberate: the expression runs once per QUERY
  * row over a bounded m-candidate gather (Q·m·k·dim work on a
  * Q-sized relation) — never on the corpus-sized hot path, which is
  * the codegen'd cosine scoring upstream.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_mmr_select"
  override protected def nullSafeEval(input: Any): Any =
    MmrOps.select(input.asInstanceOf[ArrayData], k, lambda)
  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}
