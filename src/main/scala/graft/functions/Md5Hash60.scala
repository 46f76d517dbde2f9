package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the ops-shared 60-bit content hash
  * (OpsSql.hash60). The composed builtin pipeline
  * `conv(substring(md5(c), 1, 15), 16, 10) cast LONG` pays, per row: a
  * MessageDigest provider lookup (DigestUtils.md5Hex), a 32-char hex
  * encode, a substring slice, a base-16 parse into a DECIMAL STRING
  * (Conv), and a string-to-long cast — around the one digest that does
  * the work. This computes the identical value straight from the digest
  * bytes: the first 15 hex chars of an md5 are the top 60 bits of its
  * first 8 bytes big-endian, so the value is `(first8 BE) >>> 4` — one
  * digest on a thread-local MessageDigest, zero intermediate strings,
  * inside whole-stage codegen. Bit-identity with the builtin pipeline
  * (and hence with the DuckDB oracle twin, which parses the same hex)
  * is spec-gated in Hash60Spec over random/unicode/empty inputs, and
  * every shingle/simhash/banding oracle query re-gates it end-to-end.
  */
final case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 expects a string column, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  // MessageDigest is stateful: one per task thread, reused across rows
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Entry point for both eval and generated code. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    val dig = d.digest(s.getBytes) // digest() resets for the next row
    // hex chars 1..15 = nibbles of bytes 0..6 plus byte 7's high nibble
    // = the 64-bit big-endian read of bytes 0..7 shifted right 4; the
    // result is < 2^60, always a non-negative long — exactly what
    // conv(.., 16, 10)::LONG parsed out of the hex string
    (((dig(0) & 0xFFL) << 56) |
      ((dig(1) & 0xFFL) << 48) |
      ((dig(2) & 0xFFL) << 40) |
      ((dig(3) & 0xFFL) << 32) |
      ((dig(4) & 0xFFL) << 24) |
      ((dig(5) & 0xFFL) << 16) |
      ((dig(6) & 0xFFL) << 8) |
      (dig(7) & 0xFFL)) >>> 4
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    GraftExpressionBridge.column(Md5Hash60(GraftExpressionBridge.expression(c)))
}
