package graft.patterns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source event-time union with per-source watermarks and tagging.
  * Reference pattern/split/WatermarkAlignedFanIn.java:17-144.
  *
  * Spark already takes the minimum watermark across union inputs
  * (spark.sql.streaming.multipleWatermarkPolicy=min is the default), which is
  * exactly Flink's union watermark semantics, so "alignment" is free; this
  * operator contributes per-source bounded-out-of-orderness watermarks, source
  * tagging, and schema-safe unionByName.
  *
  * On a cluster, union is a no-shuffle operator: partitions of all inputs are
  * concatenated, so N sources of M partitions fan in to N*M partitions with
  * zero data movement.
  */
final case class WatermarkAlignedFanIn(
    eventTimeCol: String,
    maxDrift: String, // e.g. "5 seconds"
    tagCol: String = "ingestSource"
) {

  def apply(sources: Seq[(String, DataFrame)]): DataFrame = {
    require(sources.size >= 2, "fan-in requires at least 2 sources (reference :122-124)")
    sources
      .map { case (name, df) =>
        val tagged = df.withColumn(tagCol, lit(name))
        if (tagged.isStreaming) tagged.withWatermark(eventTimeCol, maxDrift) else tagged
      }
      .reduce(_.unionByName(_))
  }
}
