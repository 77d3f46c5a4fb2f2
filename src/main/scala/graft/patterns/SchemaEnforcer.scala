package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presence/type gate over the schemaless JSON payload.
  * Semantics from reference pattern/schema/SchemaVersion.java:6-97 and
  * SchemaEnforcer.java:21-106: field types ∈ {STRING, NUMBER, BOOLEAN, MAP,
  * LIST, ANY}; required/optional fields; optional strict unknown-field check;
  * versions are tried newest-first, first passing version wins; rows failing
  * every version go to the DLQ with aggregated violations.
  *
  * Implementation is pure Catalyst expressions over the Spark 4 VARIANT type
  * (`try_parse_json` + `variant_get` + `schema_of_variant`) — no UDF, fully
  * codegen-friendly, so validation rides the same whole-stage pipeline as the
  * scan at any scale.
  */
object FieldType extends Enumeration {
  val STRING, NUMBER, BOOLEAN, MAP, LIST, ANY = Value
}

final case class FieldSpec(
    name: String,
    ftype: FieldType.Value,
    required: Boolean = true
)

final case class SchemaVersion(
    version: Int,
    fields: Seq[FieldSpec],
    strict: Boolean = false
)

final case class SchemaEnforcer(payloadCol: String, versionsNewestFirst: Seq[SchemaVersion]) {
  require(versionsNewestFirst.nonEmpty, "at least one schema version required")

  private def payload: Column = col(payloadCol)

  private def fieldVariant(f: FieldSpec): Column =
    try_variant_get(try_parse_json(payload), s"$$.${f.name}", "variant")

  private def typeOk(f: FieldSpec, v: Column): Column = f.ftype match {
    case FieldType.ANY => lit(true)
    case FieldType.STRING => schema_of_variant(v) === "STRING"
    case FieldType.NUMBER =>
      schema_of_variant(v).rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)")
    case FieldType.BOOLEAN => schema_of_variant(v) === "BOOLEAN"
    case FieldType.MAP => schema_of_variant(v).startsWith("OBJECT") || schema_of_variant(v).startsWith("STRUCT")
    case FieldType.LIST => schema_of_variant(v).startsWith("ARRAY")
  }

  /** Violations of one version as an array<string> column. Message format:
    * `missing:<field>`, `type:<field>`, `unknown:<key>` (keys sorted).
    */
  def violations(v: SchemaVersion): Column = {
    val fieldChecks: Seq[Column] = v.fields.flatMap { f =>
      val ext = fieldVariant(f)
      val missing =
        if (f.required) Seq(when(ext.isNull, lit(s"missing:${f.name}"))) else Seq.empty
      val badType =
        when(ext.isNotNull && !typeOk(f, ext), lit(s"type:${f.name}"))
      missing :+ badType
    }
    val base = filter(array(fieldChecks: _*), x => x.isNotNull)
    val invalidJson = when(
      try_parse_json(payload).isNull || !payload.startsWith("{"),
      array(lit("invalid:payload"))
    )
    val withStrict =
      if (!v.strict) base
      else {
        val unknown = transform(
          array_sort(
            array_except(
              json_object_keys(payload),
              array(v.fields.map(f => lit(f.name)): _*)
            )
          ),
          k => concat(lit("unknown:"), k)
        )
        concat(base, coalesce(unknown, array()))
      }
    coalesce(invalidJson, withStrict)
  }

  def passes(v: SchemaVersion): Column = size(violations(v)) === 0

  /** Version number of the first (newest) passing version, else null. */
  def matchedVersion: Column =
    versionsNewestFirst.foldLeft(lit(null).cast("int")) { (acc, v) =>
      coalesce(acc, when(passes(v), lit(v.version)))
    }

  /** Aggregated violation summary across all versions (for DLQ rows):
    * `v<N>:[a,b];v<M>:[c]`.
    */
  def allViolations: Column =
    concat_ws(
      ";",
      versionsNewestFirst.map(v =>
        concat(lit(s"v${v.version}:["), concat_ws(",", violations(v)), lit("]"))
      ): _*
    )

  /** Split into (passing rows + matched_version column, DLQ rows + violations). */
  def enforce(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.withColumn("matched_version", matchedVersion).filter(col("matched_version").isNotNull)
    val bad = df.filter(matchedVersion.isNull).withColumn("violations", allViolations)
    (good, bad)
  }
}
