package graft.stateful

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Deterministic payload normalization for change-suppression and state
  * comparison: parse JSON payload to a string map, drop excluded fields,
  * sort entries by key, render `k=v|k=v`.
  *
  * The reference hashes a sorted-entry composite (`Objects.hash << 32 |
  * toString().hashCode`, StatefulMerger.java:110-120); we keep the same
  * invariants (field-order independence, excluded-field invariance) with a
  * canonical string + xxhash64 — deterministic across JVMs, codegen-friendly.
  */
object PayloadNorm {

  def canonical(payload: Column, excludedFields: Seq[String]): Column = {
    val m = from_json(coalesce(payload, lit("{}")), MapType(StringType, StringType))
    val kept =
      if (excludedFields.isEmpty) m
      else map_filter(m, (k, _) => !k.isin(excludedFields: _*))
    concat_ws(
      "|",
      transform(
        array_sort(map_entries(kept)),
        e => concat(e.getField("key"), lit("="), coalesce(e.getField("value"), lit("∅")))
      )
    )
  }

  def hash(payload: Column, excludedFields: Seq[String]): Column =
    xxhash64(canonical(payload, excludedFields))
}
