package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed bytes / raw bytes) as a text
  * quality signal — the Gopher-family filter rule: machine-generated
  * boilerplate, keyword stuffing, and template chrome compress far
  * harder than natural prose, so very LOW ratios flag low-quality docs
  * while ratios near 1 flag high-entropy noise (base64 blobs, minified
  * JS). Complements [[graft.functions.qualityScore]]'s lexical
  * heuristics with an information-theoretic one.
  *
  * Level-6 raw deflate (no zlib header), one ThreadLocal Deflater per
  * executor thread (native allocation per call would dominate). The
  * exact byte count is a property of the JDK's zlib — stable within an
  * environment, pinned by golden rather than a cross-engine oracle
  * (DuckDB has no deflate). Empty input defines ratio 1.0.
  */
object CompressionRatio {
  private val deflaters: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, true))

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

case class CompressionRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionRatio.ratio($c)")
  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
  override def prettyName: String = "compression_ratio"
}
