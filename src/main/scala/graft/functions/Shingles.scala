package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles in one native pass — the fast path
  * for the relational form every shingle-family oracle replays:
  *
  *   array_distinct(transform(sequence(0, size(t)-n),
  *     i -> concat_ws(" ", t[i+1], ..., t[i+n])))
  *   // and [concat_ws(" ", t)] when size(t) < n
  *
  * Exact-parity contract: same joined strings (concat_ws skips null
  * elements), same FIRST-OCCURRENCE order as array_distinct, same
  * single whole-text shingle for short docs (including [""] for
  * empty token lists). The relational form runs interpreted — Spark's
  * higher-order array functions are CodegenFallback — and allocates a
  * lambda frame plus an array_distinct rescan per doc; this is one
  * scan with a LinkedHashSet. Shingling feeds ~10 of the dedup/decon
  * queries, so like the tokenizer this constant factor is corpus-
  * sized at 100 TB.
  */
object ShingleOps {

  private val Space = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val arr = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    if (len < n)
      return new GenericArrayData(Array[Any](UTF8String.concatWs(Space, arr: _*)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    val window = new Array[UTF8String](n)
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = arr(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

/** Every word-n-gram in positional order (no dedup) — the fast path
  * for `transform(sequence(0, size(t)-n), i -> concat_ws(" ",
  * slice(t, i+1, n)))`, the span-dedup gram builder. Callers guard
  * `size(t) >= n`; shorter inputs yield an empty array (the
  * relational sequence would error on a negative bound).
  */
object GramOps {

  private val Space = UTF8String.fromString(" ")

  def grams(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val arr = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = arr(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: graft_grams(array<string>, n) → array<string>. */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_grams"
  override protected def nullSafeEval(input: Any): Any =
    GramOps.grams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramOps.grams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

/** Join `struct<pos: int, tok: string>` entries in ascending `pos`
  * order with single spaces — the span-dedup reassembly tail. Fast
  * path for `concat_ws(" ", transform(array_sort(entries), x ->
  * x.tok))`: array_sort's default comparator and transform's lambda
  * both run interpreted, per kept token of every reassembled doc.
  * Positions are unique per doc, so sorting by pos alone reproduces
  * the struct-lexicographic order; null toks are skipped exactly as
  * concat_ws skips them.
  */
object ReassembleOps {

  private val Space = UTF8String.fromString(" ")

  def joinByPos(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val pos = new Array[Long](n)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      pos(i) = e.getInt(0).toLong << 32 | i // stable: pos major, arrival minor
      toks(i) = if (e.isNullAt(1)) null else e.getUTF8String(1)
      i += 1
    }
    val order = pos.clone()
    java.util.Arrays.sort(order)
    val sorted = new Array[UTF8String](n)
    i = 0
    while (i < n) { sorted(i) = toks((order(i) & 0xffffffffL).toInt); i += 1 }
    UTF8String.concatWs(Space, sorted: _*)
  }
}

/** Native Catalyst expression: graft_join_by_pos(array<struct<pos,tok>>) → string. */
case class JoinByPosExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_join_by_pos"
  override protected def nullSafeEval(input: Any): Any =
    ReassembleOps.joinByPos(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReassembleOps.joinByPos($c)")
  override protected def withNewChildInternal(newChild: Expression): JoinByPosExpr =
    copy(child = newChild)
}

/** Native Catalyst expression: graft_shingles(array<string>, n) → array<string>. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
