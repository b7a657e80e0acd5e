package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Byte-level feature expressions for opaque binary (image/audio/video)
  * columns. Codegen-friendly custom expressions — the per-byte loops stay
  * in the generated stage, no row-at-a-time UDF boundary. */
object ByteHistogram {
  /** 16-bucket histogram over byte values (bucket = b >>> 4). */
  def histogram(bytes: Array[Byte]): GenericArrayData = {
    val h = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xff) >>> 4) += 1
      i += 1
    }
    new GenericArrayData(h)
  }
}

case class ByteHistogram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ByteHistogram.histogram(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.multimodal.ByteHistogram.histogram($c)")
  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
  override def prettyName: String = "byte_histogram"
}

/** Every-Nth-byte sample of a binary payload — the Spark-side plumbing
  * shape of video frame-sampling (stride through an opaque payload,
  * emit smaller binary chunks). */
object FrameSample {
  def sample(bytes: Array[Byte], stride: Int, frameLen: Int): GenericArrayData = {
    val n = math.max(1, stride)
    val frames = Array.newBuilder[Any]
    var off = 0
    while (off < bytes.length) {
      frames += java.util.Arrays.copyOfRange(bytes, off, math.min(off + frameLen, bytes.length))
      off += n
    }
    new GenericArrayData(frames.result())
  }
}

case class FrameSample(child: Expression, stride: Int, frameLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    FrameSample.sample(input.asInstanceOf[Array[Byte]], stride, frameLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.multimodal.FrameSample.sample($c, $stride, $frameLen)")
  override protected def withNewChildInternal(newChild: Expression): FrameSample =
    copy(child = newChild)
  override def prettyName: String = "frame_sample"
}
