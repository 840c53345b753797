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

/** Sum of per-token character counts — the fast path for
  * `aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x)`
  * (two interpreted higher-order passes per doc). Null tokens are a
  * null sum, matching the relational form's null propagation.
  */
object TokenLengthOps {
  def sumChars(toks: ArrayData): Any = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      sum += toks.getUTF8String(i).numChars()
      i += 1
    }
    sum
  }
}

/** Native Catalyst expression: graft_toklen_sum(array<string>) → bigint. */
case class TokenLengthSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_toklen_sum"
  override protected def nullSafeEval(input: Any): Any =
    TokenLengthOps.sumChars(input.asInstanceOf[ArrayData])
  // sumChars can return null (a null token) even for non-null input,
  // so generated code must route through the boxed result
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sumRes")
      s"""
         |Object $tmp = graft.functions.TokenLengthOps.sumChars($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): TokenLengthSum =
    copy(child = newChild)
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
