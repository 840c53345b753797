package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score desc, id asc): a binary
  * min-heap whose root is the *worst* kept element, so insertion is
  * O(log k) and the buffer never exceeds k entries. Partial (map-side)
  * aggregation therefore ships at most k (score, id) pairs per group
  * per partition — the property that makes distributed top-k cheap at
  * scale, which a window row_number() over a full sort cannot give.
  */
final class TopKBuffer(val k: Int) {
  private[functions] var scores = new Array[Double](math.min(k, 16))
  private[functions] var ids = new Array[Long](math.min(k, 16))
  private[functions] var n = 0

  /** true if (s1, id1) ranks WORSE than (s2, id2). */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  private def grow(): Unit = {
    val cap = math.min(k, math.max(scores.length * 2, 16))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); scores(i) = scores(w); scores(w) = ts
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  def add(score: Double, id: Long): Unit =
    if (n < k) {
      if (n == scores.length) grow()
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** (score, id) pairs, best first. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** Native top-k aggregate: collects the k (score, id) pairs with the
  * highest score (ties → lowest id) into a sorted array of structs.
  * `SELECT q, graft_topk(score, id, 10) FROM ... GROUP BY q` replaces
  * the window-sort top-k pattern with map-side-combining partial
  * aggregation.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.merge(o); b }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.n * 16)
    buf.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { b.add(buf.getDouble(), buf.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}
