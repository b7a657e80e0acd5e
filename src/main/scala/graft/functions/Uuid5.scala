package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-4122 version-5 (SHA-1, name-based) UUID over the OID namespace.
  *
  * Reproduces, bit-exactly, Python's `uuid.uuid5(uuid.NAMESPACE_OID, name)`
  * used by the reference for deterministic content-derived primary keys
  * (reference: scripts/bills/bills_federal.py:27-36,
  * scripts/bills/bills_state.py:22-32, scripts/elections/nytimes_precincts.py:73).
  *
  * `java.util.UUID.nameUUIDFromBytes` is version 3 (MD5), so a custom
  * expression is required. Implemented as a codegen-friendly
  * [[UnaryExpression]]: `doGenCode` emits a static call so the whole stage
  * stays inside Tungsten codegen.
  */
object Uuid5 {
  /** uuid.NAMESPACE_OID = 6ba7b812-9dad-11d1-80b4-00c04fd430c8 */
  private val NamespaceOid: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x12, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  private val sha1 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static entry point shared by interpreted eval and generated code. */
  def uuid5(name: UTF8String): UTF8String = {
    val md = sha1.get()
    md.reset()
    md.update(NamespaceOid)
    md.update(name.getBytes)
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte // version 5
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // RFC-4122 variant
    val out = new Array[Char](36)
    var i = 0
    var j = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) { out(j) = '-'; j += 1 }
      out(j) = HexDigits((d(i) >> 4) & 0xf); j += 1
      out(j) = HexDigits(d(i) & 0xf); j += 1
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

case class Uuid5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Uuid5.uuid5(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uuid5.uuid5($c)")
  override protected def withNewChildInternal(newChild: Expression): Uuid5 =
    copy(child = newChild)
  override def prettyName: String = "uuid5"
}
