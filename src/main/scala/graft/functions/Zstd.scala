package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Zstd payload codec — the modern lake/transport codec next to the
  * reference's gzip (utils.py:17-29 only knows gzip; a 100 TB archive
  * re-compressed zstd is ~30% smaller and decompresses ~4× faster).
  * Backed by the zstd-jni library Spark itself ships for shuffle/
  * parquet compression, so no extra dependency.
  *
  * Frames are written with the content size in the header (zstd-jni
  * default), so decompression can size the output buffer exactly.
  */
object ZstdCodec {
  import com.github.luben.zstd.Zstd

  def compress(raw: Array[Byte]): Array[Byte] = Zstd.compress(raw, 3)

  def decompress(z: Array[Byte]): Array[Byte] = {
    val size = Zstd.getFrameContentSize(z)
    require(size >= 0 && size <= Int.MaxValue, s"bad zstd frame (content size $size)")
    Zstd.decompress(z, size.toInt)
  }
}

/** Native Catalyst expression: zstd-compress a binary column. */
case class ZstdBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd"
  override protected def nullSafeEval(input: Any): Any =
    ZstdCodec.compress(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdCodec.compress($c)")
  override protected def withNewChildInternal(newChild: Expression): ZstdBytes =
    copy(child = newChild)
}

/** Native Catalyst expression: zstd-decompress a binary column. */
case class UnzstdBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unzstd"
  override protected def nullSafeEval(input: Any): Any =
    ZstdCodec.decompress(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdCodec.decompress($c)")
  override protected def withNewChildInternal(newChild: Expression): UnzstdBytes =
    copy(child = newChild)
}
