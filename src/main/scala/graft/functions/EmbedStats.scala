package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused embedding statistics over one float/double array:
  * `struct(norm, n1, q_scale, q1, max_err)` =
  * (L2 norm, first element of the L2-normalized vector, symmetric-int8
  * scale maxAbs/127, first quantized element, max abs reconstruction
  * error) — the [[graft.data.Embeddings]] HOF formulations computed in TWO
  * tight loops instead of ~6 interpreted higher-order-function passes (the
  * norm embedded in a transform lambda re-evaluates per element, making the
  * HOF shape O(dim²) per row; this is O(dim)).
  *
  * Bit-parity invariants (FunctionsSpec cross-checks against the HOFs and
  * the DuckDB oracle replays them):
  *  - norm² and maxAbs accumulate LEFT-TO-RIGHT
  *  - quantization rounds HALF_UP like Spark's/DuckDB's `round`
  *  - max_err is a left-to-right `greatest` fold of |x − q·scale|
  */
case class EmbedStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EmbedStats.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"embed_stats expects array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    var norm2 = 0.0
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      norm2 += x * x
      maxAbs = math.max(maxAbs, math.abs(x))
      i += 1
    }
    val norm = math.sqrt(norm2)
    val scale = maxAbs / 127.0
    var maxErr = 0.0
    var q1 = 0
    i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      val q = if (scale == 0.0) 0 else EmbedStats.roundHalfUp(x / scale)
      if (i == 0) q1 = q
      maxErr = math.max(maxErr, math.abs(x - q * scale))
      i += 1
    }
    val x0 = if (n == 0) 0.0 else if (isF) a.getFloat(0).toDouble else a.getDouble(0)
    val n1 = if (norm == 0.0) 0.0 else x0 / norm
    InternalRow(norm, n1, scale, q1, maxErr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName EVERY local including loop variables: the snippet inlines
      // into an enclosing generated function that may already declare i/x/q,
      // and Janino rejects redefinition — silently dropping the stage to
      // interpreted execution.
      val n = ctx.freshName("n")
      val norm2 = ctx.freshName("norm2")
      val maxAbs = ctx.freshName("maxAbs")
      val norm = ctx.freshName("norm")
      val scale = ctx.freshName("scale")
      val maxErr = ctx.freshName("maxErr")
      val q1 = ctx.freshName("q1")
      val x0 = ctx.freshName("x0")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $norm2 = 0.0, $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get;
         |  $norm2 += $x * $x;
         |  $maxAbs = java.lang.Math.max($maxAbs, java.lang.Math.abs($x));
         |}
         |double $norm = java.lang.Math.sqrt($norm2);
         |double $scale = $maxAbs / 127.0;
         |double $maxErr = 0.0;
         |int $q1 = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get;
         |  int $q = ($scale == 0.0) ? 0 : graft.functions.EmbedStats.roundHalfUp($x / $scale);
         |  if ($i == 0) $q1 = $q;
         |  $maxErr = java.lang.Math.max($maxErr, java.lang.Math.abs($x - $q * $scale));
         |}
         |double $x0 = ($n == 0) ? 0.0 : ${if (elemIsFloat) s"(double) $a.getFloat(0)" else s"$a.getDouble(0)"};
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $norm, ($norm == 0.0) ? 0.0 : $x0 / $norm, $scale, $q1, $maxErr });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedStats {

  val outType: StructType = StructType(Seq(
    StructField("norm", DoubleType, nullable = false),
    StructField("n1", DoubleType, nullable = false),
    StructField("q_scale", DoubleType, nullable = false),
    StructField("q1", IntegerType, nullable = false),
    StructField("max_err", DoubleType, nullable = false)
  ))

  /** Spark's `round(double)` semantics: HALF_UP via BigDecimal (away from
    * zero on ties) — NOT `Math.round`, which floors negative ties.
    */
  def roundHalfUp(x: Double): Int =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).intValue()

  def apply(c: Column): Column = ColumnBridge.column(EmbedStats(ColumnBridge.expression(c)))
}
