package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared buffer of the rank-statistic aggregates: the value HISTOGRAM
  * value → (total count, marked count) — the same construction the
  * frame-level ops (`Stats.aucExact`, `Analytics.kaplanMeier`) build
  * distributively. Buffers merge by per-value addition, so the
  * aggregate partial-aggregates map-side like any sketch.
  *
  * Memory contract: one entry per DISTINCT value per group — the
  * collect_set memory class. These aggregates are the per-group SQL
  * convenience surface; corpus-scale single-group runs belong to the
  * frame-level ops, whose prefix sums never hold the histogram in one
  * buffer. */
final class ValueHistBuffer {
  val hist = new scala.collection.mutable.LongMap[Array[Long]]()

  def add(v: Long, marked: Boolean): Unit = {
    val slot = hist.getOrElseUpdate(v, new Array[Long](2))
    slot(0) += 1L
    if (marked) slot(1) += 1L
  }

  def mergeFrom(other: ValueHistBuffer): Unit =
    other.hist.foreach { case (v, s) =>
      val slot = hist.getOrElseUpdate(v, new Array[Long](2))
      slot(0) += s(0)
      slot(1) += s(1)
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(hist.size)
    hist.foreach { case (v, s) =>
      out.writeLong(v); out.writeLong(s(0)); out.writeLong(s(1))
    }
    out.flush()
    bos.toByteArray
  }
}

object ValueHistBuffer {
  def deserialize(bytes: Array[Byte]): ValueHistBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ValueHistBuffer
    var n = in.readInt()
    while (n > 0) {
      val v = in.readLong()
      buf.hist.put(v, Array(in.readLong(), in.readLong()))
      n -= 1
    }
    buf
  }
}

private[functions] trait ValueHistAggregate
    extends TypedImperativeAggregate[ValueHistBuffer] {
  protected def valueExpr: Expression
  protected def markExpr: Expression
  override def children: Seq[Expression] = Seq(valueExpr, markExpr)
  override def createAggregationBuffer(): ValueHistBuffer = new ValueHistBuffer
  // ANALYSIS-TIME type gate: the common call shape
  // `auc_micro(double_score, label)` must fail when the plan resolves,
  // not mid-query with an IllegalArgumentException from update() —
  // the frame-level twin (Stats.aucExact) pre-casts its scores, so SQL
  // users deserve a consistent, early error telling them to do the same
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val valueOk = valueExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val markOk = markExpr.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => true
      case _ => false
    }
    if (!valueOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an INTEGRAL value column " +
        s"(byte/short/int/long), got ${valueExpr.dataType.catalogString}; " +
        "cast explicitly — e.g. CAST(score * 1000000 AS BIGINT) — to " +
        "choose the tie quantization, exactly as the frame-level op does")
    else if (!markOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a boolean or plain-numeric mark column, " +
        s"got ${markExpr.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  // integral values and boolean-or-numeric marks are coerced here rather
  // than via ImplicitCastInputTypes (AbstractDataType is private[sql])
  override def update(buf: ValueHistBuffer, input: InternalRow): ValueHistBuffer = {
    val v = valueExpr.eval(input)
    val m = markExpr.eval(input)
    if (v != null && m != null) {
      val value = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => throw new IllegalArgumentException(
          s"$prettyName needs an integral value column, got $other")
      }
      val mark = m match {
        case b: java.lang.Boolean => b.booleanValue()
        case n: java.lang.Number => n.longValue() != 0L
        case other => throw new IllegalArgumentException(
          s"$prettyName needs a boolean/numeric mark column, got $other")
      }
      buf.add(value, mark)
    }
    buf
  }
  override def merge(buf: ValueHistBuffer, other: ValueHistBuffer): ValueHistBuffer = {
    buf.mergeFrom(other); buf
  }
  override def serialize(buf: ValueHistBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): ValueHistBuffer =
    ValueHistBuffer.deserialize(bytes)
}

/** `auc_micro(score, label)` — exact ROC AUC via the Mann–Whitney
  * rank-sum with midrank ties, as a per-group SQL aggregate. Returns
  * struct(n, n_pos, auc_micro, gini_micro) with EXACTLY the integer
  * arithmetic of [[graft.ops.Stats.aucExact]] (BigInt rank sums, one
  * floor-rounded micro division), so the two surfaces are
  * interchangeable and differentially tested. Raises on a single-class
  * group — an AUC over one class is a pipeline bug, not a 0.5. */
case class AucMicroAgg(
    valueExpr: Expression,
    markExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ValueHistAggregate {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_pos", LongType, nullable = false),
    StructField("auc_micro", LongType, nullable = false),
    StructField("gini_micro", LongType, nullable = false)))

  override def eval(buf: ValueHistBuffer): Any = {
    var n = 0L
    var nPos = 0L
    buf.hist.foreach { case (_, s) => n += s(0); nPos += s(1) }
    val nNeg = n - nPos
    if (nPos <= 0L || nNeg <= 0L)
      throw new IllegalArgumentException(
        s"auc_micro needs both classes present, got n_pos=$nPos of n=$n")
    // ascending score order; 2·midrank(v) = 2·cumBefore + cnt + 1
    var sum2r = BigInt(0)
    var cumBefore = 0L
    buf.hist.toSeq.sortBy(_._1).foreach { case (_, s) =>
      sum2r += BigInt(s(1)) * (2 * cumBefore + s(0) + 1)
      cumBefore += s(0)
    }
    val num = (sum2r - BigInt(nPos) * (nPos + 1)) * 1000000 + BigInt(nPos) * nNeg
    val auc = (num / (BigInt(nPos) * nNeg * 2)).toLong
    InternalRow(n, nPos, auc, auc * 2 - 1000000L)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AucMicroAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AucMicroAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AucMicroAgg =
    copy(valueExpr = newChildren(0), markExpr = newChildren(1))
  override def prettyName: String = "auc_micro"
}

/** `kaplan_meier(duration, event)` — right-censored Kaplan–Meier
  * survival curve as a per-group SQL aggregate: one element per distinct
  * EVENT duration, struct(t, n_risk, d, lnS_nano, surv_micro), with
  * EXACTLY the arithmetic of [[graft.ops.Analytics.kaplanMeier]]
  * (nano-nat-floored log terms summed as integers, surv exponentiated
  * once; d = n_risk rows carry the preceding lnS and surv 0). */
case class KaplanMeierAgg(
    valueExpr: Expression,
    markExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ValueHistAggregate {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("n_risk", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("lnS_nano", LongType, nullable = true),
    StructField("surv_micro", LongType, nullable = false))), containsNull = false)

  override def eval(buf: ValueHistBuffer): Any = {
    val total = buf.hist.valuesIterator.map(_(0)).sum
    var cumBefore = 0L
    var lnS = 0L
    var lnSSeen = false
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    buf.hist.toSeq.sortBy(_._1).foreach { case (t, s) =>
      val nRisk = total - cumBefore
      cumBefore += s(0)
      val d = s(1)
      if (d > 0) {
        if (d == nRisk) {
          // no finite log term: report the preceding lnS (null if none)
          rows += InternalRow(t, nRisk, d,
            if (lnSSeen) java.lang.Long.valueOf(lnS) else null, 0L)
        } else {
          val term = math.floor(math.log(
            (nRisk - d).toDouble / nRisk.toDouble) * 1e9 + 0.5).toLong
          lnS += term
          lnSSeen = true
          rows += InternalRow(t, nRisk, d, lnS,
            math.floor(math.exp(lnS.toDouble / 1e9) * 1e6 + 0.5).toLong)
        }
      }
    }
    new GenericArrayData(rows.toArray)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KaplanMeierAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KaplanMeierAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KaplanMeierAgg =
    copy(valueExpr = newChildren(0), markExpr = newChildren(1))
  override def prettyName: String = "kaplan_meier"
}
