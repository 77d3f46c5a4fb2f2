package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** k-function MinHash signature straight from a shingle-hash array: for each
  * of the k affine mixes `(a_i·(h mod P) + b_i) mod P`, the minimum over the
  * row's shingles — ONE per-row pass, ZERO shuffle.
  *
  * The explode+groupBy formulation shuffles |corpus|·|shingles| rows to
  * compute k min-aggregates; at 100 TB that shuffle dwarfs the banded-LSH
  * join that follows. Signatures are per-document pure compute, so they
  * belong in the scan: this expression replaces the shuffle with map-side
  * work (min is duplicate-insensitive, so hash-level duplicates from
  * string-distinct shingling do not change the result — bit-parity with the
  * aggregate formulation cross-checked in FunctionsSpec, and the DuckDB
  * oracle replays the same mixes).
  *
  * Empty input (possible only on generic arrays — the shingler always emits
  * at least one shingle) yields sentinel P for every slot.
  */
case class MinHashSig(child: Expression, p: Long, ab: Seq[(Long, Long)]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<bigint>, got $other")
  }

  private lazy val as: Array[Long] = ab.map(_._1).toArray
  private lazy val bs: Array[Long] = ab.map(_._2).toArray

  /** Shared by interpreted eval and codegen (referenced via addReferenceObj). */
  def compute(arr: ArrayData): ArrayData = {
    val k = as.length
    val n = arr.numElements()
    val mins = Array.fill(k)(p)
    var j = 0
    while (j < n) {
      val bh = arr.getLong(j) % p
      var i = 0
      while (i < k) {
        val v = (as(i) * bh + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, p: Long, ab: Seq[(Long, Long)]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), p, ab))
}
