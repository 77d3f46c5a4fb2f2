package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native cosine similarity over two float/double array columns.
  *
  * One fused loop accumulates dot product and both norms — replacing three
  * nested higher-order-function folds (`aggregate`/`zip_with`), which
  * allocate lambda frames per element. Whole-stage codegen emits a tight
  * primitive Java loop via [[doGenCode]].
  *
  * The per-accumulator operation ORDER matches the HOF formulation exactly
  * (left-to-right adds, then dot / (sqrt(na)*sqrt(nb))), so results are
  * bit-identical to the DuckDB oracle's list_reduce replay.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName on EVERY local including the loop variable: the
      // snippet is inlined into an enclosing generated function that may
      // already declare i/x/y, and Janino rejects redefinition — which
      // silently drops the stage to interpreted execution.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getA;
         |  double $y = $getB;
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft's native expressions. */
object GraftFunctions {

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def centroid_cosines(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidCosines(ColumnBridge.expression(vec), centroids))

  /** Register graft's native expressions for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction("int_dot", exprs => IntDotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash60", exprs => SimHash60(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("md5_hash60", exprs => Md5Hash60(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("embed_stats", exprs => EmbedStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hash60",
      exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(s"shingle_hash60 n must be an int literal, got $other")
        }
        ShingleHash60(exprs.head, n)
      },
      "built-in")
  }
}
