package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable row-constraint validation.
  * Semantics from reference pattern/quality/ConstraintEnforcer.java:19-93 and
  * the shipped rules (NotNullRule.java, RangeRule.java, FormatRule.java):
  * each rule yields a violation message or null; any violation routes the row
  * to the DLQ, clean rows pass through.
  *
  * Rules are Column expressions, so constraint checking is pushed into the
  * same codegen stage as the scan — at 100 TB this is a zero-extra-pass
  * validation layer.
  */
trait ConstraintRule extends Serializable {
  def name: String

  /** Violation message column: null when the row passes. */
  def violation: Column
}

/** reference pattern/quality/rules/NotNullRule.java:7-23 */
final case class NotNullRule(column: String) extends ConstraintRule {
  val name = s"notnull_$column"
  def violation: Column = when(col(column).isNull, lit(s"$column is null"))
}

/** min <= x <= max; non-numeric values are violations
  * (reference pattern/quality/rules/RangeRule.java:7-35).
  */
final case class RangeRule(column: String, min: Double, max: Double) extends ConstraintRule {
  val name = s"range_$column"
  def violation: Column = {
    // try_cast, not cast: ANSI mode (Spark 4 default) makes cast THROW on
    // malformed input instead of yielding null
    val v = expr(s"try_cast(`$column` AS DOUBLE)")
    when(col(column).isNotNull && v.isNull, lit(s"$column is not a number"))
      .when(v < min || v > max, lit(s"$column out of range"))
  }
}

/** Regex format rule with the reference's email()/date() presets
  * (reference pattern/quality/rules/FormatRule.java:8-42).
  */
final case class FormatRule(column: String, regex: String, label: String) extends ConstraintRule {
  val name = s"format_${column}_$label"
  def violation: Column =
    when(col(column).isNotNull && !col(column).rlike(regex), lit(s"$column bad $label"))
}

object FormatRule {
  def email(column: String): FormatRule =
    FormatRule(column, "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$", "email")
  def date(column: String): FormatRule =
    FormatRule(column, "^\\d{4}-\\d{2}-\\d{2}$", "date")
}

final case class ConstraintEnforcer(rules: Seq[ConstraintRule]) {
  require(rules.nonEmpty, "at least one rule required")

  /** array<string> of violation messages, in rule order. */
  def violationsCol: Column =
    filter(array(rules.map(_.violation): _*), x => x.isNotNull)

  /** Split into (clean rows, violating rows + `violations` string column). */
  def enforce(df: DataFrame): (DataFrame, DataFrame) = {
    val v = violationsCol
    val good = df.filter(size(v) === 0)
    val bad = df.filter(size(v) > 0).withColumn("violations", concat_ws(",", v))
    (good, bad)
  }
}
