package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image container sniffing: format + pixel dimensions from
  * the header bytes alone (PNG / JPEG / GIF / BMP), no codec library
  * and no decode — the typed-metadata step of the multimodal pipeline
  * (reference kinesis-logs-reader treats payloads as opaque bytes;
  * this is the first structured view a 100 TB image corpus needs:
  * route/filter/shard by (format, width, height) without ever
  * decoding pixels). Total per-row work is O(header), independent of
  * payload size for PNG/GIF/BMP and bounded by the marker walk for
  * JPEG. Defensive throughout: malformed, truncated, or non-image
  * bytes yield format "raw" / null dimensions, never an exception —
  * at corpus scale SOME blob is always corrupt, and one bad row must
  * not kill a 10⁵-task scan.
  */
object ImageMetaOps {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** (format, width, height); width/height = -1 when unparseable,
    * format "raw" when no magic matches.
    */
  def sniff(b: Array[Byte]): (String, Int, Int) = {
    val n = b.length
    // PNG: 8-byte signature, IHDR is REQUIRED first chunk → width and
    // height are big-endian ints at fixed offsets 16/20
    if (n >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))) {
      if (n >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        return ("png", if (w > 0) w else -1, if (h > 0) h else -1)
      }
      return ("png", -1, -1)
    }
    // GIF: "GIF87a"/"GIF89a", logical-screen size little-endian at 6/8
    if (n >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (n >= 10) return ("gif", le16(b, 6), le16(b, 8))
      return ("gif", -1, -1)
    }
    // BMP: "BM"; DIB header size at 14 picks the field layout
    // (12-byte OS/2 core header = 16-bit dims, else 32-bit; height
    // may be negative for top-down rows)
    if (n >= 2 && b(0) == 'B' && b(1) == 'M') {
      if (n >= 26) {
        val dib = le32(b, 14)
        if (dib == 12) return ("bmp", le16(b, 18), le16(b, 20))
        if (n >= 26 && dib >= 16) {
          val w = le32(b, 18); val h = math.abs(le32(b, 22))
          return ("bmp", w, h)
        }
      }
      return ("bmp", -1, -1)
    }
    // JPEG: FF D8, then a marker walk to the first frame header
    // (SOFn) whose payload carries height/width big-endian. Walk is
    // bounded: each segment advances by its declared length; fill
    // bytes and standalone markers are skipped per the spec
    if (n >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < n) {
        if ((b(i) & 0xff) != 0xff) return ("jpeg", -1, -1)
        var j = i
        while (j + 1 < n && (b(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
        if (j + 1 >= n) return ("jpeg", -1, -1)
        val m = b(j + 1) & 0xff
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 2 // standalone marker, no length field
        } else if (m == 0xd9 || m == 0xda) {
          // EOI, or SOS without a preceding SOF: dims unavailable
          // (entropy-coded data follows SOS; a valid file put SOF first)
          return ("jpeg", -1, -1)
        } else {
          if (j + 3 >= n) return ("jpeg", -1, -1)
          val len = be16(b, j + 2)
          if (len < 2) return ("jpeg", -1, -1)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 8 >= n) return ("jpeg", -1, -1)
            return ("jpeg", be16(b, j + 7), be16(b, j + 5))
          }
          // Long cursor (the AudioMeta discipline): a declared segment
          // length at the end of a near-2GB payload must not wrap the
          // Int cursor negative and index out of bounds
          val next = j.toLong + 2L + len
          if (next + 1 >= n) return ("jpeg", -1, -1)
          i = next.toInt
        }
      }
      return ("jpeg", -1, -1)
    }
    ("raw", -1, -1)
  }

  def parse(b: Array[Byte]): InternalRow = {
    val (fmt, w, h) = sniff(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt),
      if (w > 0) Int.box(w) else null,
      if (h > 0) Int.box(h) else null))
  }
}

/** Native expression: ImageMeta(binary) →
  * struct<format: string, width: int, height: int>.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))
  override def prettyName: String = "graft_image_meta"
  override protected def nullSafeEval(input: Any): Any =
    ImageMetaOps.parse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageMetaOps.parse($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}
