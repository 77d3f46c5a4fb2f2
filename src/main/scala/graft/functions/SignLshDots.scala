package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sign-LSH hyperplane dot products of a vector in ONE fused loop.
  *
  * Replaces the per-plane higher-order-function formulation (nbits separate
  * `aggregate(zip_with(...))` Catalyst lambda chains per row — each
  * allocating lambda frames per element) with a single codegen'd nbits×dim
  * multiply-add nest over a constant plane matrix. The bucket id and the
  * multi-probe flip order both derive from this array with cheap 8-element
  * column arithmetic, so the vector is scanned exactly once per row.
  *
  * Accumulation is left-to-right per plane, bit-identical to the HOF
  * formulation and to the DuckDB oracle's list_reduce replay
  * (FunctionsSpec pins parity).
  */
case class SignLshDots(child: Expression, planes: Seq[Seq[Double]]) extends UnaryExpression {

  private val nbits = planes.length
  private val dim = planes.headOption.map(_.length).getOrElse(0)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_dots expects array<float|double> input, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Plane matrix flattened row-major: plane i component j at [i*dim + j]. */
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val isF = elemIsFloat
    val out = new Array[Double](nbits)
    var i = 0
    while (i < nbits) {
      val off = i * dim
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
        acc += x * flat(off + j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
      // freshName EVERY local including loop variables: the snippet is
      // inlined into an enclosing generated function that may already
      // declare i/j, and Janino rejects redefinition (which silently drops
      // the whole stage to interpreted execution)
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val getV = if (elemIsFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$nbits];
         |for (int $i = 0; $i < $nbits; $i++) {
         |  double $acc = 0.0;
         |  int $off = $i * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += ($getV) * $planesRef[$off + $j];
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
