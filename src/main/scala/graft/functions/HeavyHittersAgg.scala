package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries counter set, capacity `m`: any token whose true frequency
  * exceeds N/(m+1) is guaranteed retained; retained counts undercount the
  * truth by at most N/(m+1). Mergeable (Agarwal et al., "Mergeable
  * Summaries"): sum counters, then subtract the (m+1)-th largest count
  * and drop non-positives. */
final class HeavyHittersBuffer(val m: Int) {
  val counts = new mutable.HashMap[UTF8String, Long]()

  /** One occurrence of `t`. `t` must be safe to retain (cloned). */
  def addOne(t: UTF8String): Unit = {
    counts.get(t) match {
      case Some(c) => counts.update(t, c + 1)
      case None if counts.size < m => counts.update(t, 1L)
      case None => // decrement-all step; the arriving token is absorbed
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def mergeFrom(other: HeavyHittersBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > m) {
      val vs = counts.values.toArray.sortBy(-_)
      val cut = vs(m) // (m+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** Approximate heavy hitters (frequent tokens) over a TEXT column as a
  * [[TypedImperativeAggregate]]: each partition keeps a bounded
  * Misra-Gries counter set (update tokenizes the lowercased text inline —
  * no explode row blow-up), and only `m` counters per partition cross the
  * exchange. The exact formulation (explode → groupBy token → count)
  * shuffles every token occurrence: O(corpus tokens) rows vs O(partitions
  * × m). This is the corpus-vocabulary scale path; q51 keeps the exact
  * variant as its oracle-checked twin.
  *
  * Output: array<struct<token, count>> sorted count desc then token asc;
  * counts are lower bounds (true count ≤ count + N/(m+1)). */
case class HeavyHitters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("count", LongType))), containsNull = false)

  override def createAggregationBuffer(): HeavyHittersBuffer = new HeavyHittersBuffer(m)

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val raw = child.eval(input)
    // the shared [[Tokenize]] kernel — its agreement with q51's exact
    // split-on-\s+ twin is load-bearing (sketch counts must bound the
    // exact counts of the SAME token stream)
    if (raw != null)
      Tokenize.foreachToken(raw.asInstanceOf[UTF8String])(buf.addOne)
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HeavyHittersBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (t, c) => (-c, t.toString) }
    new GenericArrayData(sorted.map { case (t, c) => InternalRow(t, c) }.toArray[Any])
  }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HeavyHittersBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}
