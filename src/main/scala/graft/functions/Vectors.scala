package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

import org.apache.spark.sql.graftshim.ColumnShim

/** Dense-vector kernels for embedding columns (`array<float>`).
  * Static methods over Spark's unboxed ArrayData so generated code
  * calls straight into a tight primitive loop — no per-element
  * boxing, no UDF serialization.
  */
object VectorOps {
  /** Cosine similarity; accumulates in double, sequential index
    * order (matches an equivalent sequential SQL formulation).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Raw dot product (float arrays), double accumulation. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** Raw dot product (double arrays). */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  /** Hamming distance between two bit signatures stored as long-word
    * arrays: popcount(xor) summed across words. Word counts must
    * match: signatures packed at different dims (a stale index served
    * against new-dim queries, say) would otherwise silently produce
    * an understated distance over the common prefix — a correctness
    * hazard for every radius/exactness guarantee built on top.
    */
  def hammingL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_hamming: signature word counts differ ($n vs ${b.numElements()}) — " +
          "operands were packed at different dims")
    var hd = 0L
    var i = 0
    while (i < n) { hd += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    hd
  }

  private def checkPackDim(n: Int, expectDim: Int): Unit =
    if (expectDim > 0 && n != expectDim)
      throw new IllegalArgumentException(
        s"graft_signpack: vector length $n != declared dim $expectDim — " +
          "a dim/data mismatch would silently diverge from the band " +
          "layout and any dim-hardcoded oracle replay")

  /** Sign-bit pack (float arrays): bit j of word w set iff
    * `v[w*wordBits + j] > 0`; null elements contribute no bit. A
    * trailing partial word pads with zero bits. `expectDim > 0`
    * asserts the runtime vector length (0 = unchecked). */
  def signPackF(v: ArrayData, wordBits: Int, expectDim: Int): ArrayData = {
    val n = v.numElements()
    checkPackDim(n, expectDim)
    val words = (n + wordBits - 1) / wordBits
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i) && v.getFloat(i) > 0f)
        out(i / wordBits) |= 1L << (i % wordBits)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sign-bit pack (double arrays) — see [[signPackF]]. */
  def signPackD(v: ArrayData, wordBits: Int, expectDim: Int): ArrayData = {
    val n = v.numElements()
    checkPackDim(n, expectDim)
    val words = (n + wordBits - 1) / wordBits
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i) && v.getDouble(i) > 0d)
        out(i / wordBits) |= 1L << (i % wordBits)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native Catalyst expression: dot product of two numeric arrays.
  * Same sequential double accumulation as [[CosineSimilarity]], so
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` is bit-identical to
  * `cosine(a,b)` — callers can hoist the per-row norms out of a pair
  * join and pay one multiply-add per element per pair instead of
  * three.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private lazy val isFloat: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isFloat) VectorOps.dotF(x, y) else VectorOps.dotD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "dotF" else "dotD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Native Catalyst expression: cosine similarity of two numeric
  * arrays. Element type (float/double) is resolved at plan time, so
  * codegen dispatches statically.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private lazy val isFloat: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isFloat) VectorOps.cosineF(x, y) else VectorOps.cosineD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "cosineF" else "cosineD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Native Catalyst expression: Hamming distance between two bit
  * signatures (`array<bigint>` word layouts, e.g. [[graft.operators
  * .Similarity.signSig]]'s sign packs) — popcount(xor) per word in a
  * primitive loop. A `zip_with`+`aggregate` composition computes the
  * same thing but higher-order functions don't participate in
  * whole-stage codegen, which matters on the one kernel an s19-style
  * scan evaluates N·|Q| times.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hamming"

  // reject non-signature operands at ANALYSIS time (upstream Catalyst
  // convention): without this a mistyped child falls through to
  // getLong on the wrong physical layout and misbehaves at execution
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> signatures, got ${l.sql} and ${r.sql}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hammingL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.hammingL($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

/** Native Catalyst expression: sign-bit signature of a numeric array
  * (bit j of word w set iff `v[w*wordBits + j] > 0`) — the packer
  * behind [[graft.operators.Similarity.signSig]]. A literal-unrolled
  * `when` chain computes the same thing inside codegen, but emits
  * dim CASE branches per row; this is one primitive loop, one method
  * call in the generated code. `wordBits ≤ 32` keeps every word
  * non-negative so the DuckDB oracle replays the packing with
  * non-overflowing BIGINT shifts.
  */
case class SignPack(child: Expression, wordBits: Int, expectDim: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(wordBits >= 1 && wordBits < 64, s"wordBits=$wordBits out of range")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_signpack"

  // analysis-time input check: a non-float child (array<int>, say)
  // would otherwise fall through isFloat to getDouble and misbehave
  // at execution rather than being rejected up front
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.ArrayType
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${t.sql}")
    }
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (isFloat) VectorOps.signPackF(v, wordBits, expectDim)
    else VectorOps.signPackD(v, wordBits, expectDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "signPackF" else "signPackD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.$m($c, $wordBits, $expectDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}
