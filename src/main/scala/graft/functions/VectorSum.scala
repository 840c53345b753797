package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector-sum buffer: a fixed `dim`-doubles accumulator
  * plus a row count — the centroid-mean primitive. Size-bounded by
  * construction (one double per dimension), so a hash map of millions
  * of them is safe under [[graft.GraftSession.withBoundedObjectAgg]].
  */
final class VecSumBuffer {
  private[functions] var sum: Array[Double] = null
  private[functions] var count: Long = 0L

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val n = v.numElements()
    if (sum == null) sum = new Array[Double](n)
    require(n == sum.length, s"vector length $n != ${sum.length}")
    var i = 0
    while (i < n) {
      sum(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    count += 1
  }

  def merge(o: VecSumBuffer): Unit =
    if (o.sum != null) {
      if (sum == null) { sum = o.sum.clone(); count = o.count }
      else {
        require(sum.length == o.sum.length,
          s"vector length ${o.sum.length} != ${sum.length}")
        var i = 0
        while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
        count += o.count
      }
    }
}

/** Native element-wise array-sum aggregate over an `array<float>` /
  * `array<double>` column, with the row count carried alongside:
  * `graft_vecsum(vec)` → `struct<sum: array<double>, n: bigint>`.
  *
  * This is the Lloyd-round recentering primitive: `sum / n` is the
  * cell mean. The naive relational form — posexplode → groupBy
  * (cell, pos) → avg → collect_list — shuffles N×dim rows per round;
  * this aggregate partial-combines map-side, so one fixed-size buffer
  * per (partition, cell) crosses the shuffle regardless of N or dim.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"graft_vecsum needs array<float|double>, got ${t.sql}")
  }

  override def prettyName: String = "graft_vecsum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType)))

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }

  override def merge(b: VecSumBuffer, o: VecSumBuffer): VecSumBuffer = {
    b.merge(o); b
  }

  override def eval(b: VecSumBuffer): Any =
    if (b.sum == null) null
    else InternalRow(new GenericArrayData(b.sum), b.count)

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val n = if (b.sum == null) 0 else b.sum.length
    val buf = ByteBuffer.allocate(12 + n * 8)
    buf.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(b.sum(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new VecSumBuffer
    b.count = buf.getLong()
    val n = buf.getInt()
    if (n > 0) {
      b.sum = new Array[Double](n)
      var i = 0
      while (i < n) { b.sum(i) = buf.getDouble(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = c(0))
}
