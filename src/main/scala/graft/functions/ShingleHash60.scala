package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array as 60-bit md5 hashes —
  * ONE pass fusing what the HOF formulation does in four
  * (`sequence` → `transform(slice+concat_ws)` → `array_distinct` → per-row
  * hash after an explode of ~20-char strings). The explode downstream then
  * carries 8-byte longs instead of strings, which is what the
  * shuffle-bound LSH joins see.
  *
  * Bit-parity invariants (cross-checked in FunctionsSpec, replayed by the
  * DuckDB oracle):
  *  - shingle i = tokens[i..i+n) joined with " "; docs shorter than n
  *    contribute their full token run as a single shingle (empty token
  *    array → the empty-string shingle), matching
  *    `sequence(1, greatest(size-n+1, 1))` + `slice`
  *  - distinct keeps FIRST occurrence order (array_distinct semantics)
  *  - hash = first 60 bits of md5 over the UTF-8 shingle ([[Md5Hash60]])
  */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"shingle_hash60 expects array<string>, got $other")
  }

  /** Shared by interpreted eval and codegen (referenced via addReferenceObj). */
  def compute(tokens: ArrayData): ArrayData = ShingleHash60.eval(tokens, n)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  // generated code must call through a reference object, NOT
  // `graft.functions.ShingleHash60.eval(...)`: the companion's `eval`
  // gets NO static forwarder (the class inherits Expression.eval, which
  // shadows the name), so Janino failed to resolve the call and silently
  // dropped every projection containing this expression to interpreted
  // execution
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("shingleHash", this, classOf[ShingleHash60].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash60 {

  private val space = UTF8String.fromString(" ")

  def eval(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.HashSet[UTF8String](count * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](count)
    var i = 0
    while (i < count) {
      // slice(tokens, i+1, n): up to n tokens starting at i; concat_ws
      // skips nulls like Spark's ConcatWs
      val upper = math.min(i + n, len)
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = i
      while (j < upper) {
        val t = tokens.getUTF8String(j)
        if (t != null) parts.add(t)
        j += 1
      }
      val shingle = UTF8String.concatWs(space, parts.toArray(new Array[UTF8String](parts.size())): _*)
      if (seen.add(shingle)) out += java.lang.Long.valueOf(Md5Hash60.hash(shingle.getBytes))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash60(ColumnBridge.expression(c), n))
}
