package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 60-bit SimHash over an array of (60-bit) token hashes.
  *
  * Bit b of the result is set iff `sum over tokens of ((h>>b)&1)*2-1 > 0` —
  * identical to the nested higher-order-function formulation and the DuckDB
  * oracle replay, but as ONE codegen'd loop (tokens × 60 primitive ops)
  * instead of ~60·n interpreted lambda frames, which dominated the simhash
  * benchmark.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash60 expects array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) {
        counts(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName EVERY local including loop variables: the snippet inlines
      // into an enclosing generated function that may already declare i/h/b,
      // and Janino rejects redefinition — silently dropping the stage to
      // interpreted execution.
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counts[$b] += ((int) (($h >> $b) & 1L) * 2) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(c: Column): Column = ColumnBridge.column(SimHash60(ColumnBridge.expression(c)))
}
