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
  * codegen-friendly. The payload is parsed to VARIANT ONCE per row
  * (`enforce` materializes it in a temp column); every field/type/version
  * check then probes the parsed value, so validation cost is one JSON parse
  * plus cheap variant probes regardless of schema width.
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

  private def typeOk(f: FieldSpec, v: Column): Column = f.ftype match {
    case FieldType.ANY => lit(true)
    case FieldType.STRING => schema_of_variant(v) === "STRING"
    case FieldType.NUMBER =>
      schema_of_variant(v).rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)")
    case FieldType.BOOLEAN => schema_of_variant(v) === "BOOLEAN"
    case FieldType.MAP =>
      schema_of_variant(v).startsWith("OBJECT") || schema_of_variant(v).startsWith("STRUCT")
    case FieldType.LIST => schema_of_variant(v).startsWith("ARRAY")
  }

  /** Violations of one version as an array<string> column, probing the
    * pre-parsed variant `pv`. Message format: `missing:<field>`,
    * `type:<field>`, `unknown:<key>` (keys sorted).
    */
  def violations(v: SchemaVersion, pv: Column): Column = {
    val fieldChecks: Seq[Column] = v.fields.flatMap { f =>
      val ext = try_variant_get(pv, s"$$.${f.name}", "variant")
      val missing =
        if (f.required) Seq(when(ext.isNull, lit(s"missing:${f.name}"))) else Seq.empty
      val badType =
        when(ext.isNotNull && !typeOk(f, ext), lit(s"type:${f.name}"))
      missing :+ badType
    }
    val base = filter(array(fieldChecks: _*), x => x.isNotNull)
    // ltrim: try_parse_json accepts leading whitespace, so the object-shape
    // guard must too — a raw startsWith would DLQ "  {...}" despite pv being
    // a perfectly valid object
    val invalidJson = when(
      pv.isNull || !ltrim(payload).startsWith("{"),
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

  def passes(v: SchemaVersion, pv: Column): Column = size(violations(v, pv)) === 0

  /** Version number of the first (newest) passing version, else null. */
  def matchedVersion(pv: Column): Column =
    versionsNewestFirst.foldLeft(lit(null).cast("int")) { (acc, v) =>
      coalesce(acc, when(passes(v, pv), lit(v.version)))
    }

  /** Aggregated violation summary across all versions (for DLQ rows):
    * `v<N>:[a,b];v<M>:[c]`.
    */
  def allViolations(pv: Column): Column =
    concat_ws(
      ";",
      versionsNewestFirst.map(v =>
        concat(lit(s"v${v.version}:["), concat_ws(",", violations(v, pv)), lit("]"))
      ): _*
    )

  /** Split into (passing rows + matched_version column, DLQ rows + violations).
    * The payload is parsed once into `_pv`; both outputs drop it.
    * ComputeOnce pins both the variant parse and the version verdict to one
    * evaluation per row — filter pushdown would otherwise substitute the
    * whole matchedVersion tree (variant parse included) into the split
    * predicates down at the scan (see [[graft.functions.ComputeOnce]]).
    */
  def enforce(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.withColumn("_pv", graft.functions.ComputeOnce(try_parse_json(payload)))
    val withVerdict = parsed.withColumn(
      "matched_version",
      graft.functions.ComputeOnce(matchedVersion(col("_pv"))))
    val good = withVerdict
      .filter(col("matched_version").isNotNull)
      .drop("_pv")
    val bad = withVerdict
      .filter(col("matched_version").isNull)
      .drop("matched_version")
      .withColumn("violations", allViolations(col("_pv")))
      .drop("_pv")
    (good, bad)
  }
}
