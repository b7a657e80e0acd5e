package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact integer moment accumulator for [[graft.ops.Pca]]: sums a
  * quantized (long) vector column's per-dimension totals AND the
  * upper-triangle Gram products in ONE buffer, without materializing the
  * d(d+1)/2 product rows per input the explode+groupBy formulation pays
  * (64-dim → 2 144 rows/vector; this kernel does 2 144 multiply-adds
  * into a flat long array instead — no row objects, no per-cell hashing).
  *
  * Exactness at any corpus size: the hot path accumulates in Long and
  * SPILLS to BigInteger before any overflow is possible — before each
  * row, if (rowsSinceFlush + 1) · maxAbs² could approach 2⁶³ the longs
  * flush into the BigInteger ledger (a per-element |x| so large that a
  * single product overflows routes that row directly to the ledger).
  * Merge flushes both sides and adds ledgers — exact and associative, so
  * the result is partitioning-independent by construction, same contract
  * as the DECIMAL(38,0) sums it replaces. */
final class MomentsBuffer(val dim: Int) {
  val cells: Int = dim + dim * (dim + 1) / 2
  var n: Long = 0L
  val acc = new Array[Long](cells)
  var spill: Array[BigInteger] = _
  var rowsSinceFlush: Long = 0L
  var maxAbs: Long = 0L

  def flush(): Unit = {
    if (spill == null) spill = Array.fill(cells)(BigInteger.ZERO)
    var i = 0
    while (i < cells) {
      if (acc(i) != 0L) { spill(i) = spill(i).add(BigInteger.valueOf(acc(i))); acc(i) = 0L }
      i += 1
    }
    rowsSinceFlush = 0L
    maxAbs = 0L
  }

  /** Accumulate one row. `xs(i)` must hold the quantized elements. */
  def add(xs: Array[Long]): Unit = {
    var rowMax = 0L
    var i = 0
    while (i < dim) { val a = math.abs(xs(i)); if (a > rowMax) rowMax = a; i += 1 }
    if (rowMax > 3000000000L) { addBig(xs); n += 1; return }
    val newMax = math.max(maxAbs, rowMax)
    if ((rowsSinceFlush + 1).toDouble * newMax.toDouble * newMax.toDouble > 4.0e18)
      flush()
    maxAbs = math.max(maxAbs, rowMax)
    i = 0
    while (i < dim) { acc(i) += xs(i); i += 1 }
    var k = dim
    i = 0
    while (i < dim) {
      val xi = xs(i)
      var j = i
      while (j < dim) { acc(k) += xi * xs(j); k += 1; j += 1 }
      i += 1
    }
    rowsSinceFlush += 1
    n += 1
  }

  /** Ledger path for a row whose single products could overflow Long. */
  private def addBig(xs: Array[Long]): Unit = {
    flush()
    var i = 0
    while (i < dim) {
      spill(i) = spill(i).add(BigInteger.valueOf(xs(i)))
      i += 1
    }
    var k = dim
    i = 0
    while (i < dim) {
      val xi = BigInteger.valueOf(xs(i))
      var j = i
      while (j < dim) {
        spill(k) = spill(k).add(xi.multiply(BigInteger.valueOf(xs(j))))
        k += 1; j += 1
      }
      i += 1
    }
  }

  def mergeFrom(other: MomentsBuffer): Unit = {
    flush()
    other.flush()
    var i = 0
    while (i < cells) { spill(i) = spill(i).add(other.spill(i)); i += 1 }
    n += other.n
  }

  /** Exact totals: dim mean sums followed by the upper-triangle Gram. */
  def totals: Array[BigInteger] = {
    flush()
    spill
  }
}

/** Aggregate wrapper: input is an `array<bigint>` column of quantized
  * vectors (every row exactly `dim` long — callers pre-assert); output
  * is `struct<n: bigint, sums: array<decimal(38,0)>>` with sums laid out
  * mean(0..dim-1) then Gram upper triangle row-major. */
case class VectorMomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuffer] {

  require(dim > 0, s"dim must be positive: $dim")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DecimalType(38, 0), containsNull = false))))

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer(dim)

  override def update(buf: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val raw = child.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"moments expect $dim-dim vectors, got ${arr.numElements()}")
      buf.add(arr.toLongArray())
    }
    buf
  }

  override def merge(buf: MomentsBuffer, other: MomentsBuffer): MomentsBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MomentsBuffer): Any = {
    val sums = buf.totals.map(bi =>
      Decimal(new java.math.BigDecimal(bi), 38, 0))
    InternalRow(buf.n, new GenericArrayData(sums.toArray[Any]))
  }

  override def serialize(buf: MomentsBuffer): Array[Byte] = {
    buf.flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.n)
    buf.spill.foreach { bi =>
      val b = bi.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MomentsBuffer(in.readInt())
    buf.n = in.readLong()
    buf.spill = Array.tabulate(buf.cells) { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      new BigInteger(b)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "vector_moments"
}
