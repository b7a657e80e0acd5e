package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan) + a bounded candidate set —
  * the MERGEABLE heavy-hitters scale path next to [[HeavyHittersBuffer]]'s
  * Misra-Gries counters. The two trade opposite ways:
  *
  *   - Misra-Gries counts are LOWER bounds and its merge degrades with
  *     partition count (each pairwise merge subtracts the (m+1)-th
  *     largest count, so error compounds as O(partitions) merges stack);
  *   - CMS counts are UPPER bounds (est ≤ true + εN with ε = e/width at
  *     confidence 1 − e^−depth) and its merge is EXACT — tables add
  *     cell-wise, so the merged estimate equals the single-machine
  *     estimate regardless of how many partitions contributed. On a
  *     1000-executor shuffle that partition-count independence is what
  *     makes the sketch trustworthy.
  *
  * The sketch alone answers "how often did X occur", not "which X are
  * frequent" — candidate tracking supplies the latter: each buffer keeps
  * the `2k` tokens with the highest sketch estimate seen in ITS stream
  * (2× headroom over the k requested, so a token locally ranked k+3 but
  * globally top-k still survives the union), and merge re-estimates the
  * union of candidates against the MERGED table before re-trimming. A
  * token that is top-k globally but outside the candidate cap in every
  * partition can still be missed — the standard CMS-top-k caveat; size
  * `k` with headroom against the expected skew.
  */
final class CmsBuffer(val depth: Int, val width: Int, val k: Int) {
  val table = new Array[Long](depth * width)
  /** token → sketch estimate as of its last occurrence (estimates only
    * grow, so stored values are valid lower bounds of current ones). */
  val candidates = new mutable.HashMap[UTF8String, Long]()
  var n = 0L

  private def cap: Int = 2 * k

  /** Cached lower bound of the minimum candidate estimate: estimates
    * only grow, so a stale cached min underestimates — safe to use as a
    * fast reject, recomputed only when an insertion might evict. */
  private var minBound = 0L

  private def cell(t: UTF8String, row: Int): Int = {
    // row-seeded murmur over the token bytes; floorMod because the Int
    // hash is signed
    val h = MurmurHash3.bytesHash(t.getBytes, 0x9747b28c + row)
    row * width + math.floorMod(h, width)
  }

  def estimate(t: UTF8String): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(cell(t, r))
      if (v < est) est = v
      r += 1
    }
    est
  }

  def addOne(t: UTF8String): Unit = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val i = cell(t, r)
      table(i) += 1
      if (table(i) < est) est = table(i)
      r += 1
    }
    n += 1
    if (candidates.contains(t)) candidates.update(t, est)
    else if (candidates.size < cap) candidates.update(t, est)
    else if (est > minBound) {
      // recompute the true min (the cached bound may be stale-low)
      var minTok: UTF8String = null
      var minEst = Long.MaxValue
      candidates.foreach { case (tok, e) =>
        if (e < minEst || (e == minEst && (minTok == null || tok.compareTo(minTok) < 0))) {
          minEst = e; minTok = tok
        }
      }
      minBound = minEst
      if (est > minEst) {
        candidates.remove(minTok)
        candidates.update(t, est)
      }
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"CMS geometry mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    n += other.n
    // union candidates, re-estimate against the MERGED table (this is
    // what makes merged counts partition-count independent), re-trim
    other.candidates.keysIterator.foreach(t => candidates.update(t, 0L))
    val rescored = candidates.keysIterator.map(t => t -> estimate(t)).toArray
    candidates.clear()
    val kept =
      if (rescored.length <= cap) rescored
      else rescored.sortBy { case (t, e) => (-e, t.toString) }.take(cap)
    kept.foreach { case (t, e) => candidates.update(t, e) }
    minBound = 0L
  }

  /** Final top-k by merged-table estimate, count desc then token asc. */
  def topK: Array[(UTF8String, Long)] =
    candidates.keysIterator.map(t => t -> estimate(t)).toArray
      .sortBy { case (t, e) => (-e, t.toString) }.take(k)
}

/** Approximate frequent-token aggregate over a TEXT column via
  * count-min sketch + candidate tracking (see [[CmsBuffer]]). Same
  * inline \s-boundary lowercase tokenizer and same output surface as
  * [[HeavyHitters]] — array<struct<token, count>> sorted count desc then
  * token asc, truncated to k — but counts are UPPER bounds
  * (true ≤ count ≤ true + εN, ε = e/width) and the merge is exact, so
  * estimates do not depend on the partition count. Buffer crossing the
  * exchange: depth×width longs + 2k candidates (default geometry
  * 4×4096 = 128 KB), vs Misra-Gries' O(m) — the price of mergeability.
  */
case class CmsHeavyHitters(
    child: Expression,
    k: Int,
    depth: Int = 4,
    width: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(k > 0, s"k must be positive: $k")
  require(depth > 0 && width > 0, s"bad CMS geometry: ${depth}x$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("count", LongType))), containsNull = false)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width, k)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val raw = child.eval(input)
    // the shared [[Tokenize]] kernel — parity with HeavyHittersAgg and
    // q51's exact split-on-\s+ twin, in one place by construction
    if (raw != null)
      Tokenize.foreachToken(raw.asInstanceOf[UTF8String])(buf.addOne)
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CmsBuffer): Any =
    new GenericArrayData(buf.topK.map { case (t, c) => InternalRow(t, c) }.toArray[Any])

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.depth)
    out.writeInt(buf.width)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    buf.table.foreach(out.writeLong)
    out.writeInt(buf.candidates.size)
    buf.candidates.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CmsBuffer(in.readInt(), in.readInt(), in.readInt())
    buf.n = in.readLong()
    var i = 0
    while (i < buf.table.length) { buf.table(i) = in.readLong(); i += 1 }
    val nCand = in.readInt()
    i = 0
    while (i < nCand) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.candidates.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsHeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsHeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsHeavyHitters =
    copy(child = newChildren(0))
  override def prettyName: String = "cms_heavy_hitters"
}
