package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine similarity of a vector against ALL k centroids in ONE fused
  * k×dim multiply-add nest over a constant centroid matrix — the coarse
  * quantizer kernel for auto-k IVF / SemDeDup, where k grows with the
  * corpus (rows-per-bucket rule) and the per-centroid column formulations
  * stop scaling: the unrolled k-expression plan is O(k·dim) expression
  * nodes, and the `transform`-over-literal HOF form drops the whole stage
  * to interpreted lambda evaluation with per-element boxing (measured 50×
  * wall at k=625 on the sf1 probe before this kernel).
  *
  * Bit-identical to k independent [[CosineSimilarity]] calls: each
  * accumulator (dot, |v|², |c|²) is its own left-to-right fold, so hoisting
  * the vector norm out of the centroid loop and precomputing centroid
  * norms at construction changes no result bit. The ragged case
  * (vector shorter than dim) falls back to the exact interleaved
  * min-length loop per centroid, again matching [[CosineSimilarity]].
  */
case class CentroidCosines(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = centroids.headOption.map(_.length).getOrElse(0)
  require(k > 0, "centroid_cosines: need at least one centroid")
  require(centroids.forall(_.length == dim), "centroid_cosines: centroids must share one dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_cosines expects array<float|double> input, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Centroid matrix flattened row-major: centroid i component j at [i*dim + j]. */
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  /** sqrt(|c|²) per centroid, |c|² accumulated left-to-right like the HOF. */
  @transient private lazy val norms: Array[Double] = centroids.map { c =>
    var nb = 0.0
    var j = 0
    while (j < c.length) { nb += c(j) * c(j); j += 1 }
    math.sqrt(nb)
  }.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    val out = new Array[Double](k)
    if (n >= dim) {
      var na = 0.0
      var j = 0
      while (j < dim) {
        val x = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
        na += x * x
        j += 1
      }
      val sna = math.sqrt(na)
      var i = 0
      while (i < k) {
        val off = i * dim
        var dot = 0.0
        var j2 = 0
        while (j2 < dim) {
          val x = if (isF) a.getFloat(j2).toDouble else a.getDouble(j2)
          dot += x * flat(off + j2)
          j2 += 1
        }
        out(i) = dot / (sna * norms(i))
        i += 1
      }
    } else {
      // ragged vector: exact CosineSimilarity min-length semantics
      var i = 0
      while (i < k) {
        val off = i * dim
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        var j = 0
        while (j < n) {
          val x = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
          val y = flat(off + j)
          dot += x * y
          na += x * x
          nb += y * y
          j += 1
        }
        out(i) = dot / (math.sqrt(na) * math.sqrt(nb))
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
      // freshName EVERY local: the snippet inlines into a generated
      // function that may already declare these, and Janino rejects
      // redefinition (silently dropping the stage to interpreted)
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      def getV(idx: String) =
        if (elemIsFloat) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[$k];
         |if ($n >= $dim) {
         |  double $na = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    double $x = ${getV(j)};
         |    $na += $x * $x;
         |  }
         |  double $sna = java.lang.Math.sqrt($na);
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $off = $i * $dim;
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (${getV(j)}) * $flatRef[$off + $j];
         |    }
         |    $out[$i] = $dot / ($sna * $normsRef[$i]);
         |  }
         |} else {
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $off = $i * $dim;
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $x = ${getV(j)};
         |      double $y = $flatRef[$off + $j];
         |      $dot += $x * $y;
         |      $na += $x * $x;
         |      $nb += $y * $y;
         |    }
         |    $out[$i] = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
