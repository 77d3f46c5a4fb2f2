package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels. Both replace per-subspace
  * higher-order-function dot folds (`aggregate`/`zip_with` per codeword —
  * m·k interpreted lambda folds per row) with one fused primitive loop
  * nest; accumulation order inside each dot is left-to-right from 0.0,
  * bit-identical to the HOF `dotConst` formulation and the DuckDB
  * `list_reduce` replay (FunctionsSpec cross-checks both kernels).
  *
  * The codebooks ride as a flattened `double[]` reference object —
  * model-sized (m·k·sub doubles), embedded once per generated class, never
  * per row.
  */
private[functions] trait PqKernel { self: UnaryExpression =>
  def codebooks: Seq[Seq[Seq[Double]]]
  @transient protected lazy val m: Int = codebooks.length
  @transient protected lazy val k: Int = codebooks.head.length
  @transient protected lazy val sub: Int = codebooks.head.head.length
  @transient protected lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var p = 0
    for (cb <- codebooks; cw <- cb; x <- cw) { a(p) = x; p += 1 }
    a
  }

  protected def checkVec(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PQ kernel expects array<float|double> input, got $other")
    }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** get element i of the vector as double, 0.0 past the end. Ragged
    * vectors shorter than m·sub don't occur on the PQ paths (dim % m is
    * checked at codebook build); if one ever arrives, this contributes 0.0
    * where the HOF `zip_with` form would null the whole dot — don't feed
    * ragged vectors.
    */
  protected def vecAt(a: ArrayData, i: Int): Double =
    if (i < a.numElements()) { if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i) }
    else 0.0
}

/** PQ encoding: array<int> of length m — per subspace, the argmax
  * codeword (ties → lowest index; a NaN score wins like Spark's
  * `array_max`, first NaN locking the argmax, matching the HOF
  * formulation exactly).
  *
  * `nearest = false` ranks codewords by raw dot (the MIPS-flavored
  * encode the seeded oracle faces replay); `nearest = true` subtracts the
  * per-codeword bias 0.5·‖cw‖² from each dot, which makes the argmax the
  * EUCLIDEAN-nearest codeword (argmin ‖x−c‖² ≡ argmax ⟨x,c⟩ − ‖c‖²/2 —
  * the classic PQ encode of Jégou/Douze/Schmid, TPAMI'11): the right
  * reconstruction objective for Lloyd-TRAINED codebooks, whose mean
  * codewords are not norm-equalized the way smallest-id seed slices
  * happen to be (raw argmax-dot against means lets high-norm codewords
  * soak up mass — the same hotspot the IMI cell quantizer fixed by
  * normalizing; scoring codewords must stay RAW, so the bias moves into
  * the encode instead). The bias fold is left-to-right sum of squares,
  * then one 0.5·x — the exact arithmetic the trainer and the DuckDB
  * oracle replay.
  */
case class PqEncode(
    child: Expression,
    codebooks: Seq[Seq[Seq[Double]]],
    nearest: Boolean = false
) extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec()

  /** biasFlat(mi·k + j) = 0.5·Σ cw(i)² (left-to-right), or all-zero for
    * the raw argmax-dot mode — one flat model-sized array either way so
    * eval and codegen share a single scoring formula.
    */
  @transient private lazy val biasFlat: Array[Double] = {
    val a = new Array[Double](m * k)
    if (nearest) {
      var p = 0
      for (cb <- codebooks; cw <- cb) {
        var ss = 0.0
        var i = 0
        while (i < cw.length) { ss += cw(i) * cw(i); i += 1 }
        a(p) = 0.5 * ss
        p += 1
      }
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.NegativeInfinity
      var bestJ = 0
      var bestNaN = false
      var j = 0
      while (j < k && !bestNaN) {
        var dot = 0.0
        var i = 0
        while (i < sub) {
          dot += vecAt(v, mi * sub + i) * flat((mi * k + j) * sub + i)
          i += 1
        }
        val score = dot - biasFlat(mi * k + j)
        if (java.lang.Double.isNaN(score)) { best = score; bestJ = j; bestNaN = true }
        else if (score > best) { best = score; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val bias = ctx.addReferenceObj("pqBias", biasFlat, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nv = ctx.freshName("nv")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val bestNaN = ctx.freshName("bestNaN")
      val idx = ctx.freshName("idx")
      s"""
         |int[] $out = new int[$m];
         |int $nv = $v.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestJ = 0;
         |  boolean $bestNaN = false;
         |  for (int $j = 0; $j < $k && !$bestNaN; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $idx = $mi * $sub + $i;
         |      $dot += ($idx < $nv ? (double) $v.$get($idx) : 0.0)
         |        * $cbs[($mi * $k + $j) * $sub + $i];
         |    }
         |    double $score = $dot - $bias[$mi * $k + $j];
         |    if (java.lang.Double.isNaN($score)) { $best = $score; $bestJ = $j; $bestNaN = true; }
         |    else if ($score > $best) { $best = $score; $bestJ = $j; }
         |  }
         |  $out[$mi] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Coarse-quantization PROJECTION residual: array<double> of the input's
  * length — per subspace, with the argmax-dot codeword (the [[PqEncode]]
  * raw contract: ties → lowest index, NaN locks) and its dot s = ⟨v,cw⟩,
  * emit `v − s·cw` componentwise: the orthogonal complement of the
  * sub-vector against its own cell codeword. This is the IVFADC residual
  * construction (Jégou/Douze/Schmid TPAMI'11 §IV — quantize residuals,
  * not raw vectors) adapted to SPHERICAL cells: the unit-norm cell
  * codewords carry direction only, so subtracting them raw would INFLATE
  * residuals (measured 1.56× the vector norm on unit embeddings — a
  * unit codeword minus a ~0.7-norm half); projecting instead makes the
  * residual strictly smaller than the half (‖r‖² = ‖v_h‖² − s², never
  * larger) and the decomposition ⟨q,x⟩ = s₀·⟨q₀,cw₀⟩ + s₁·⟨q₁,cw₁⟩ +
  * ⟨q,r⟩ EXACT in its center term — only r gets quantized. One fused
  * kernel: argmax and subtraction share the codeword loads; per-component
  * order is `v[i] − s·cw[i]` (one multiply, one subtract), the order the
  * trainer and the DuckDB oracle replay.
  */
case class PqResidual(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec()

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](m * sub)
    var mi = 0
    while (mi < m) {
      var best = Double.NegativeInfinity
      var bestJ = 0
      var bestNaN = false
      var j = 0
      while (j < k && !bestNaN) {
        var dot = 0.0
        var i = 0
        while (i < sub) {
          dot += vecAt(v, mi * sub + i) * flat((mi * k + j) * sub + i)
          i += 1
        }
        if (java.lang.Double.isNaN(dot)) { best = dot; bestJ = j; bestNaN = true }
        else if (dot > best) { best = dot; bestJ = j }
        j += 1
      }
      var i = 0
      while (i < sub) {
        out(mi * sub + i) = vecAt(v, mi * sub + i) - best * flat((mi * k + bestJ) * sub + i)
        i += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nv = ctx.freshName("nv")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val bestNaN = ctx.freshName("bestNaN")
      val idx = ctx.freshName("idx")
      s"""
         |double[] $out = new double[${m * sub}];
         |int $nv = $v.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestJ = 0;
         |  boolean $bestNaN = false;
         |  for (int $j = 0; $j < $k && !$bestNaN; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $idx = $mi * $sub + $i;
         |      $dot += ($idx < $nv ? (double) $v.$get($idx) : 0.0)
         |        * $cbs[($mi * $k + $j) * $sub + $i];
         |    }
         |    if (java.lang.Double.isNaN($dot)) { $best = $dot; $bestJ = $j; $bestNaN = true; }
         |    else if ($dot > $best) { $best = $dot; $bestJ = $j; }
         |  }
         |  for (int $i = 0; $i < $sub; $i++) {
         |    int $idx = $mi * $sub + $i;
         |    $out[$idx] = ($idx < $nv ? (double) $v.$get($idx) : 0.0)
         |      - $best * $cbs[($mi * $k + $bestJ) * $sub + $i];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table, FLATTENED: array<double> of length m·k where
  * element mi·k + j = dot(query subvector mi, codeword j). Callers index
  * with `element_at(lut, mi*k + code + 1)`.
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec()

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < k) {
        var dot = 0.0
        var i = 0
        while (i < sub) {
          dot += vecAt(v, mi * sub + i) * flat((mi * k + j) * sub + i)
          i += 1
        }
        out(mi * k + j) = dot
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nv = ctx.freshName("nv")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val idx = ctx.freshName("idx")
      s"""
         |double[] $out = new double[${m * k}];
         |int $nv = $v.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $idx = $mi * $sub + $i;
         |      $dot += ($idx < $nv ? (double) $v.$get($idx) : 0.0)
         |        * $cbs[($mi * $k + $j) * $sub + $i];
         |    }
         |    $out[$mi * $k + $j] = $dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Pq {
  def encode(v: Column, codebooks: Seq[Seq[Seq[Double]]], nearest: Boolean = false): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks, nearest))
  def residual(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqResidual(ColumnBridge.expression(v), codebooks))
  def lut(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(v), codebooks))
}
