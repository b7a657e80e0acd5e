package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Buffer for [[TopKByScore]]: a bounded binary max-heap on (-score, id)
  * keeping the k best (highest score; ties broken by smaller id). */
final class TopKBuffer(val k: Int) {
  // heap root = current WORST of the kept k, so insertion is O(log k)
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0 && worseThan(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worseThan(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = ids(a); ids(a) = ids(b); ids(b) = t
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var worst = i
      if (l < size && worseThan(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < size && worseThan(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) done = true else { swap(i, worst); i = worst }
    }
  }

  /** (id, score) pairs best-first. */
  def sorted: Array[(Long, Double)] =
    Array.tabulate(size)(i => (ids(i), scores(i)))
      .sortBy { case (id, s) => (-s, id) }
}

/** Per-group top-k as a [[TypedImperativeAggregate]]: keeps a bounded
  * heap per group, so top-k runs as partial (map-side) aggregation —
  * each input partition contributes at most k candidates to the shuffle
  * instead of every scored row crossing the exchange the way a
  * `row_number() OVER (...)` window does. This is the difference between
  * an ANN scan shuffling O(corpus × probes) rows and O(probes × k).
  *
  * Input: (score: Double, id: Long); output: array<struct<id, score>>
  * best-first, ties on score broken by smaller id (same ordering as the
  * window formulation, so results are interchangeable).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (id, s) =>
      InternalRow(id, s)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { val s = in.readDouble(); val id = in.readLong(); buf.add(s, id); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
