package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an expensive expression to ONE evaluation per
  * row at its projection site.
  *
  * Catalyst freely substitutes project aliases into downstream predicates
  * (filter pushdown) and sibling projections; for a cheap expression that is
  * the right call, but for a JSON parse it multiplies full tokenizer passes
  * per row — and once `OptimizeJsonExprs` prunes each substituted copy's
  * schema differently, subexpression elimination can no longer merge them
  * (the measured envelope-DLQ plan carried ~10 separate `from_json(value)`
  * calls inside the scan-level filter). Marking the wrapper
  * [[Nondeterministic]] makes every such rule keep its distance: filters
  * stay ABOVE the projection and reference the computed attribute, projects
  * don't collapse through it, and column pruning can't elide it while it is
  * referenced. Evaluation itself is a pure pass-through of the child.
  *
  * Use for parse-once columns (envelope struct, DLQ probe verdicts); do NOT
  * use in join/aggregate keys, where nondeterminism is rejected by analysis.
  */
case class ComputeOnce(child: Expression) extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ComputeOnce {
  def apply(c: Column): Column = ColumnBridge.column(ComputeOnce(ColumnBridge.expression(c)))
}
