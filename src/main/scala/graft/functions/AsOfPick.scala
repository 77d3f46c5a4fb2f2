package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-search as-of probe: given a version history as an array of
  * structs SORTED ASCENDING by its first field (a timestamp/long), return
  * the element with the greatest first field `<= ts`, or NULL when every
  * version is later (the as-of miss).
  *
  * Exists because the composable formulation —
  * `try_element_at(filter(hist, v -> v._ts <= ts), -1)` — is O(h) per row
  * with a lambda frame per element: at sf0.1 the broadcast as-of face spent
  * 10.2 s scanning ~1200-version histories per event. The probe is the
  * textbook O(log h) search, fused into whole-stage codegen.
  *
  * Both children nullable; a null history or null probe ts is a miss.
  * First-field nulls are the CALLER's contract to exclude (a version
  * without a time is meaningless; `AsOfJoin` builds histories from
  * collect_list of non-null-ts structs).
  */
case class AsOfPick(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  private def elemStruct: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  private def numFields: Int = elemStruct.size

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(st: StructType, _) if st.nonEmpty =>
      (st.head.dataType, right.dataType) match {
        case (TimestampType, TimestampType) | (LongType, LongType) =>
          TypeCheckResult.TypeCheckSuccess
        case (f, r) =>
          TypeCheckResult.TypeCheckFailure(
            s"asof_pick orders on the first struct field: need matching timestamp/long types, got ($f, $r)")
      }
    case other =>
      TypeCheckResult.TypeCheckFailure(s"asof_pick expects array<struct<...>>, got $other")
  }

  override def nullSafeEval(h: Any, t: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val ts = t.asInstanceOf[Long] // timestamps are physically long micros
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, numFields).getLong(0) <= ts) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null else arr.getStruct(ans, numFields)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, t) => {
      // freshName every local (see SignLshDots: Janino redefinition in the
      // enclosing generated function silently drops the stage to interpreted)
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val ans = ctx.freshName("ans")
      s"""
         |int $lo = 0;
         |int $hi = $h.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($h.getStruct($mid, $numFields).getLong(0) <= $t) { $ans = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |if ($ans < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.getStruct($ans, $numFields);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfPick =
    copy(left = newLeft, right = newRight)
}

object AsOfPick {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(hist: Column, ts: Column): Column =
    ColumnBridge.column(AsOfPick(ColumnBridge.expression(hist), ColumnBridge.expression(ts)))
}
