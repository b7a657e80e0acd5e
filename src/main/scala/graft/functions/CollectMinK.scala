package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Buffer for [[CollectMinK]]: a bounded binary MAX-heap on (id, v)
  * keeping the k smallest pairs, plus a running count of every row seen.
  * The heap root is the current LARGEST of the kept k, so each insert is
  * an O(1) compare against the root + O(log k) sift — and the buffer can
  * never exceed k entries no matter how many rows the group has.
  *
  * Storage grows geometrically up to k instead of allocating 2×k longs
  * up front: in the common LSH regime almost every band bucket holds a
  * handful of rows, and with k=1024 the eager layout costs 16 KB of
  * allocation churn PER GROUP — measured +46% on the q15 minhash bench
  * (~70k tiny buckets) versus collect_list's growable buffer. */
final class MinKBuffer(val k: Int) {
  private var cap = math.min(k, 8).max(1)
  var ids = new Array[Long](cap)
  var vs = new Array[Long](cap)
  var size = 0
  var n = 0L // total rows seen (not capped) — callers observe overflow

  private def greaterThan(i1: Long, v1: Long, i2: Long, v2: Long): Boolean =
    i1 > i2 || (i1 == i2 && v1 > v2)

  /** Insert one pair, counting it; keeps only the k smallest by (id, v). */
  def add(id: Long, v: Long): Unit = {
    n += 1
    insert(id, v)
  }

  /** Heap insert without touching the seen-count (used by merge, which
    * adds the other buffer's count wholesale). */
  def insert(id: Long, v: Long): Unit = {
    if (size < k) {
      if (size == cap) {
        cap = math.min(cap * 2, k)
        ids = java.util.Arrays.copyOf(ids, cap)
        vs = java.util.Arrays.copyOf(vs, cap)
      }
      var i = size
      ids(i) = id; vs(i) = v; size += 1
      while (i > 0 && greaterThan(ids(i), vs(i), ids((i - 1) / 2), vs((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && greaterThan(ids(0), vs(0), id, v)) {
      ids(0) = id; vs(0) = v
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val t = ids(a); ids(a) = ids(b); ids(b) = t
    val u = vs(a); vs(a) = vs(b); vs(b) = u
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var largest = i
      if (l < size && greaterThan(ids(l), vs(l), ids(largest), vs(largest))) largest = l
      if (r < size && greaterThan(ids(r), vs(r), ids(largest), vs(largest))) largest = r
      if (largest == i) done = true else { swap(i, largest); i = largest }
    }
  }

  /** (id, v) pairs ascending by (id, v) — the deterministic "first k
    * sorted ids" contract. */
  def sorted: Array[(Long, Long)] =
    Array.tabulate(size)(i => (ids(i), vs(i))).sorted
}

/** Bounded "collect the k smallest" aggregate for LSH bucket kernels.
  *
  * `collect_list` + `slice` caps the OUTPUT but first materializes the
  * whole group in one aggregation buffer — on a 100 TB web corpus a
  * degenerate band key (templated boilerplate that survives exact dedup)
  * can put millions of ids under one key, i.e. a single multi-GB
  * aggregation row. This aggregate keeps a bounded heap instead: the
  * buffer is O(k) always, partial (map-side) aggregation applies, and
  * merge combines two O(k) heaps.
  *
  * Input: (id: Long, v: Long) — v is an optional payload that rides
  * along (e.g. a SimHash); pass the id itself when unused. Ordering and
  * the heap compare are on plain longs (cheap), never struct compare.
  *
  * Output: struct<items: array<struct<id,v>> ascending, n: bigint> where
  * n counts EVERY row the group saw — so `n > k` is an observable signal
  * that a bucket was truncated (silent recall loss is detectable).
  */
case class CollectMinK(
    idExpr: Expression,
    vExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  override def children: Seq[Expression] = Seq(idExpr, vExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))), containsNull = false)),
    StructField("n", LongType)))

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val i = idExpr.eval(input)
    val v = vExpr.eval(input)
    if (i != null && v != null)
      buf.add(i.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.ids(i), other.vs(i)); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: MinKBuffer): Any =
    InternalRow(
      new GenericArrayData(buf.sorted.map { case (id, v) =>
        InternalRow(id, v)
      }.toArray[Any]),
      buf.n)

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.ids(i)); out.writeLong(buf.vs(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MinKBuffer(in.readInt())
    val n = in.readInt()
    val seen = in.readLong()
    var i = 0
    while (i < n) { val id = in.readLong(); val v = in.readLong(); buf.insert(id, v); i += 1 }
    buf.n = seen
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectMinK =
    copy(idExpr = newChildren(0), vExpr = newChildren(1))
  override def prettyName: String = "collect_min_k"
}
