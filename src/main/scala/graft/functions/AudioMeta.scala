package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM audio container sniffing: format, sample rate, channel
  * count, bit depth, and frame count from the header bytes alone
  * (WAV/RIFF, AIFF, AU) — the audio twin of [[ImageMetaOps]] (the
  * reference kinesis-logs-reader treats payloads as opaque bytes;
  * this is the structured view an audio corpus needs to route,
  * filter, and duration-bucket 100 TB of recordings without decoding
  * a single sample). Per-row work is O(header): the RIFF/FORM chunk
  * walks stop at the data chunk's DECLARED size — samples are never
  * read. Defensive throughout, like the image sniffer: malformed,
  * truncated, or non-audio bytes yield format "raw" / null fields,
  * never an exception.
  */
object AudioMetaOps {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** The 80-bit IEEE 754 extended float AIFF's COMM chunk stores the
    * sample rate in (SANE "extended"): 1 sign + 15 exponent bits,
    * then a 64-bit mantissa WITH explicit integer bit. Audio rates
    * are small positive integers, so the integer conversion is exact.
    */
  private def extended80(b: Array[Byte], i: Int): Long = {
    val se = be16(b, i)
    val exp = se & 0x7fff
    if ((se & 0x8000) != 0 || exp == 0) return -1 // negative or zero
    val hi = be32(b, i + 2); val lo = be32(b, i + 6)
    val mant = (hi << 32) | lo
    val shift = exp - 16383 - 63
    if (shift > 0 || shift < -63) return -1 // out of integer range
    val v = mant >>> (-shift)
    if (v <= 0 || v > Int.MaxValue) -1 else v
  }

  private val NoMeta = ("raw", -1, -1, -1, -1L)

  /** (format, sampleRate, channels, bitsPerSample, nFrames); -1 for
    * any field that can't be parsed, format "raw" when no magic
    * matches. The catch-all backstops the 'malformed bytes never
    * throw' contract against any index arithmetic a crafted header
    * might still slip past the bounds checks.
    */
  def sniff(b: Array[Byte]): (String, Int, Int, Int, Long) =
    try sniffImpl(b) catch { case _: RuntimeException => NoMeta }

  private def sniffImpl(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    val n = b.length
    // WAV: "RIFF" <size> "WAVE", then little-endian (id, size) chunks;
    // "fmt " carries rate/channels/bits, "data"'s declared size over
    // the block align gives the frame count without reading samples
    if (n >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var rate = -1; var ch = -1; var bits = -1; var block = -1
      var frames = -1L
      var i = 12
      while (i + 8 <= n) {
        val size = le32(b, i + 4)
        if (size < 0 || size > Int.MaxValue) return ("wav", rate, ch, bits, frames)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
            size >= 16 && i + 8 + 16 <= n) {
          ch = le16(b, i + 10)
          rate = le32(b, i + 12).toInt
          block = le16(b, i + 20)
          bits = le16(b, i + 22)
        } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
          if (block > 0) frames = size / block
          return ("wav", rate, ch, bits, frames)
        }
        // Long cursor: a declared size near Int.MaxValue must not wrap
        // `i` negative (a ~28-byte corrupt header could otherwise index
        // out of bounds) — chunks pad to even
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > n) return ("wav", rate, ch, bits, frames)
        i = next.toInt
      }
      return ("wav", rate, ch, bits, frames)
    }
    // AIFF: "FORM" <size> "AIFF", big-endian chunks; COMM carries
    // channels, numSampleFrames, sampleSize, and the rate as an
    // 80-bit extended float
    if (n >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F') {
      var i = 12
      while (i + 8 <= n) {
        val size = be32(b, i + 4)
        if (size < 0 || size > Int.MaxValue) return ("aiff", -1, -1, -1, -1L)
        if (b(i) == 'C' && b(i + 1) == 'O' && b(i + 2) == 'M' && b(i + 3) == 'M' &&
            size >= 18 && i + 8 + 18 <= n) {
          val ch = be16(b, i + 8)
          val frames = be32(b, i + 10)
          val bits = be16(b, i + 14)
          val rate = extended80(b, i + 16)
          return ("aiff", rate.toInt, ch, bits, frames)
        }
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > n) return ("aiff", -1, -1, -1, -1L)
        i = next.toInt
      }
      return ("aiff", -1, -1, -1, -1L)
    }
    // AU: ".snd" then six big-endian words — no chunk walk at all
    if (n >= 24 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') {
      val dataSize = be32(b, 8)
      val enc = be32(b, 12)
      val rate = be32(b, 16)
      val ch = be32(b, 20)
      val bits = enc match {
        case 1L => 8   // mu-law
        case 2L => 8   // 8-bit linear PCM
        case 3L => 16  // 16-bit linear PCM
        case 4L => 24
        case 5L => 32
        case _ => -1
      }
      val frames =
        if (bits > 0 && ch > 0 && dataSize >= 0 && dataSize != 0xffffffffL)
          dataSize / (ch * (bits / 8))
        else -1L
      return ("au", rate.toInt, ch.toInt, bits, frames)
    }
    NoMeta
  }

  def parse(b: Array[Byte]): InternalRow = {
    val (fmt, rate, ch, bits, frames) = sniff(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt),
      if (rate > 0) Int.box(rate) else null,
      if (ch > 0) Int.box(ch) else null,
      if (bits > 0) Int.box(bits) else null,
      if (frames >= 0) Long.box(frames) else null))
  }
}

/** Native expression: AudioMeta(binary) → struct<format: string,
  * sample_rate: int, channels: int, bits: int, n_frames: long>.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))
  override def prettyName: String = "graft_audio_meta"
  override protected def nullSafeEval(input: Any): Any =
    AudioMetaOps.parse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioMetaOps.parse($c)")
  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}
