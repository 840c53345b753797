package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer — the codegen'd fast path for
  * `split(trim(regexp_replace(lower(text), "\s+", " ")), " ")`, the
  * normalization every text operator shares (and the DuckDB oracles
  * replay verbatim). Exact-parity contract:
  *
  *   - lowercase via Spark's own UTF8String.toLowerCase (identical to
  *     the `lower()` the relational form used);
  *   - separators are Java-regex `\s` = the six ASCII bytes
  *     0x09–0x0D and 0x20 (all < 0x80, so a byte scan is UTF-8-safe);
  *     runs collapse, leading/trailing runs trim;
  *   - empty / all-whitespace input yields `[""]`, matching
  *     split(trim(...)) on an empty string.
  *
  * One byte scan, token slices share the lowered buffer — no regex
  * engine, no intermediate normalized string, no per-token copies.
  * This is the per-row floor of the whole d/t query family, so the
  * constant factor here is corpus-sized at 100 TB.
  */
object TokenizeOps {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val toks = new java.util.ArrayList[AnyRef](math.min(64, n / 4 + 1))
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) toks.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    if (toks.isEmpty) toks.add(UTF8String.EMPTY_UTF8)
    new GenericArrayData(toks.toArray)
  }
}

/** Native Catalyst expression: graft_tokenize(string) → array<string>. */
case class TokenizeWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_tokenize"
  override protected def nullSafeEval(input: Any): Any =
    TokenizeOps.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeOps.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
}
