package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5(input) as a non-negative long — bit-identical to
  * `conv(substring(md5(x),1,15),16,10)` (and the DuckDB oracle's
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) but computed straight from
  * the digest bytes: no 32-char hex string, no base-16 string parse. This
  * sits on the hottest dedup path (one call per shingle — billions of calls
  * at corpus scale).
  *
  * first 15 hex chars = first 7.5 bytes = (first 8 bytes big-endian) >>> 4.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"md5_hash60 expects string/binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Md5Hash60.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val conv =
        if (child.dataType == StringType) s"byte[] $bytes = $c.getBytes();"
        else s"byte[] $bytes = $c;"
      s"""
         |$conv
         |${ev.value} = graft.functions.Md5Hash60.hash($bytes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {

  /** JVM-shared digest instances (MessageDigest is not thread-safe). */
  private val digest = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v >>> 4
  }

  def apply(c: Column): Column = ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))
}
