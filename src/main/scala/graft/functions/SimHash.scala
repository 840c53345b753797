package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array.
  *
  * Per token: a 64-bit hash = the first 8 bytes (big-endian) of the
  * token's MD5 — i.e. the first 16 hex chars of `md5(token)`, which
  * any SQL engine can replay (the DuckDB oracle reconstructs the bit
  * votes from `substr(md5(tok),1,8)` / `substr(md5(tok),9,8)` halves,
  * turning d3/m4 into hash-checked rows). Each of the 64 bit
  * positions votes +1/-1; the sign of each position's total forms the
  * fingerprint. Near-identical token multisets → small Hamming
  * distance. Single narrow pass per row; MD5 is a few× slower per
  * byte than a non-cryptographic hash, but the hash is a per-token
  * map-side cost and keeps the operator engine-replayable.
  */
object SimHashOps {
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash64(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 8 digest bytes big-endian == first 16 hex chars of md5(s)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val HexUpper: Array[Byte] = "0123456789ABCDEF".getBytes

  /** SimHash64 over a binary payload's overlapping byte-4-grams,
    * tokenized EXACTLY like the m4 composition
    * `transform(sequence(1, greatest(1, length(hex(bin)) - 7), 2),
    * i -> hex(bin).substr(i, 8))`: tokens are the uppercase-hex
    * encodings of 4-byte windows at byte stride 1 (hex positions
    * 1,3,5,…; a payload shorter than 4 bytes yields ONE short token,
    * the whole hex string — md5("") for the empty payload). Fused
    * into one pass over the raw bytes: no payload-sized hex string,
    * no token array, no per-token UTF8String — each token's 8 hex
    * chars are written into a reused stack buffer and hashed there.
    * Vote fold and per-token hash are byte-identical to
    * [[simhash]]/[[hash64]] (first 8 md5 bytes big-endian), so the
    * fingerprints — and the DuckDB replay — are unchanged.
    */
  def simhashBytes(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    val counts = new Array[Int](64)
    val tok = new Array[Byte](8)
    val hexLen = bytes.length * 2
    val lastStart = math.max(1, hexLen - 7) // 1-based first hex char of last token
    var i = 1
    while (i <= lastStart) {
      val limit = math.min(8, hexLen - (i - 1)) // < 8 only when hexLen < 8
      var k = 0
      while (k < limit) {
        val hp = i - 1 + k // 0-based hex position; i is odd so hp starts even
        val b = bytes(hp >> 1) & 0xff
        tok(k) = if ((hp & 1) == 0) HexUpper(b >> 4) else HexUpper(b & 0xf)
        k += 1
      }
      md.reset()
      md.update(tok, 0, math.max(0, limit))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b2 = 0
      while (b2 < 64) {
        counts(b2) += ((((h >>> b2) & 1L).toInt) << 1) - 1
        b2 += 1
      }
      i += 2
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native Catalyst expression: SimHashBytes(binary) → long — the
  * fused byte-gram twin of [[SimHash64]] (see
  * [[SimHashOps.simhashBytes]] for the exact token contract).
  */
case class SimHashBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_bytes"
  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.simhashBytes(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.simhashBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashBytes =
    copy(child = newChild)
}

/** Native Catalyst expression: SimHash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
