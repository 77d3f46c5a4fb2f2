package graft.connectors.cdcv2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-cdc`: a DataSource V2 change-stream source — the Spark-native
  * rebuild of the reference's custom Flink Source-API CDC connector
  * (reference connector/mongo/MongoChangeStreamSource.java:30-328 and
  * MultiCdcSourceBuilder.java:20-42).
  *
  * The change log is an append-only directory of JSONL change events (the
  * zero-egress stand-in for a Mongo change stream; swap the file tailer for
  * a change-stream cursor without touching the Spark side).
  *
  * LOG CONTRACT (what the resume-token watermark requires of producers):
  *  - segments are IMMUTABLE once visible — lines appended to a file after
  *    its name passed the watermark are never read (write to a temp name,
  *    rename in when closed, like Kafka log segments);
  *  - segment names must be lexicographically monotonic — zero-pad counters
  *    (`000042.jsonl`): a `seg-10` created after `seg-9` sorts BELOW the
  *    watermark and would be silently skipped.
  *
  * Semantics kept from the reference:
  *
  *  - **resume token**: the streaming Offset is the lexicographic file-name
  *    watermark; Spark checkpoints it per micro-batch and hands it back on
  *    restart (`deserializeOffset`) — exactly the `resumeAfter` flow. A
  *    wiped/invalid checkpoint falls back to a fresh cursor (initialOffset).
  *  - **server-side hash-mod splits**: `numSplits` input partitions per
  *    batch, each reading only documents with
  *    `abs(hash(documentKey._id)) % numSplits == i` — the reference's
  *    `$match` fan-out (buildHashModPipeline :49-57), here as parallel
  *    readers of the same log segment.
  *  - **at-least-once**: a batch replayed after failure re-emits its rows;
  *    downstream dedup/idempotent sinks absorb duplicates.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("path", dir).option("numSplits", "4").load()
  * }}}
  */
class CdcV2Provider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.connectors.CdcSource.cdcSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val numSplits = Option(opts.get("numSplits")).map(_.toInt).getOrElse(4)
    // 0 splits would plan zero partitions while offsets keep advancing —
    // every event silently skipped
    require(numSplits > 0, s"numSplits must be positive, got $numSplits")
    new CdcTable(
      Option(opts.get("path")).getOrElse(throw new IllegalArgumentException("path required")),
      numSplits
    )
  }
}

class CdcTable(path: String, numSplits: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-cdc:$path"
  override def schema(): StructType = graft.connectors.CdcSource.cdcSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CdcScan(path, numSplits)
    }
}

class CdcScan(path: String, numSplits: Int) extends Scan {
  override def readSchema(): StructType = graft.connectors.CdcSource.cdcSchema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(path, numSplits)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val files = CdcLog.listFiles(path)
      (0 until numSplits).map(i => CdcInputPartition(files, i, numSplits): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory
  }
}

/** The resume token: lexicographic high-water mark over change-log file
  * names (mirror of the reference's MongoSplit resume-token state,
  * util/MongoSplit.java:6-39).
  */
case class CdcOffset(watermark: String) extends Offset {
  override def json(): String = s"""{"watermark":${CdcLog.quote(watermark)}}"""
}

class CdcMicroBatchStream(path: String, numSplits: Int) extends MicroBatchStream {

  override def initialOffset(): Offset = CdcOffset("") // fresh cursor

  override def latestOffset(): Offset = {
    val files = CdcLog.listFiles(path)
    CdcOffset(if (files.isEmpty) "" else files.max)
  }

  override def deserializeOffset(json: String): Offset =
    // a corrupted/hand-edited checkpoint falls back to a fresh cursor (the
    // class contract) instead of NPE-ing the restart; at-least-once absorbs
    // the resulting replay downstream
    try {
      val node = new ObjectMapper().readTree(json)
      val wm = node.get("watermark")
      CdcOffset(if (wm == null) "" else wm.asText())
    } catch { case _: Exception => CdcOffset("") }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[CdcOffset].watermark
    val hi = end.asInstanceOf[CdcOffset].watermark
    val files = CdcLog.listFiles(path).filter(f => f > lo && f <= hi)
    if (files.isEmpty) Array.empty
    else (0 until numSplits).map(i => CdcInputPartition(files, i, numSplits): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory

  override def commit(end: Offset): Unit = () // log is external; nothing to ack

  override def stop(): Unit = ()
}

case class CdcInputPartition(files: Seq[String], splitIndex: Int, numSplits: Int)
    extends InputPartition

class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    new CdcPartitionReader(p.files, p.splitIndex, p.numSplits)
  }
}

class CdcPartitionReader(files: Seq[String], splitIndex: Int, numSplits: Int)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // Track the open segment so each file handle is closed when the next
  // segment opens (and in close()) — a lazy fromFile chain would leak one
  // descriptor per segment per partition per micro-batch.
  private var openSource: scala.io.Source = _
  private val lines: Iterator[String] = files.iterator.flatMap { f =>
    if (openSource != null) openSource.close()
    openSource = scala.io.Source.fromFile(f, "UTF-8")
    openSource.getLines()
  }
  private var current: InternalRow = _

  /** The reference's hash-mod `$match` on documentKey._id (:49-57).
    * `_id` may itself be a value OR an object (compound keys) — asText()
    * returns "" for container nodes, which would collapse every row onto
    * split 0; mirror the row decoder's value-vs-container handling.
    */
  private def inSplit(documentKey: String): Boolean = {
    val id =
      try {
        val n = mapper.readTree(documentKey)
        if (n != null && n.has("_id")) {
          val v = n.get("_id")
          if (v.isValueNode) v.asText() else v.toString
        } else documentKey
      } catch { case _: Exception => documentKey }
    math.floorMod(if (id == null) 0 else id.hashCode, numSplits) == splitIndex
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        try {
          val n = mapper.readTree(line)
          def str(k: String): UTF8String =
            if (n.hasNonNull(k)) UTF8String.fromString(
              if (n.get(k).isValueNode) n.get(k).asText() else n.get(k).toString)
            else null
          val dk = if (n.hasNonNull("documentKey")) n.get("documentKey").asText() else ""
          if (inSplit(dk)) {
            val tsMicros: Any =
              if (n.hasNonNull("eventTime"))
                try {
                  val inst = java.time.Instant.parse(n.get("eventTime").asText())
                  inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                } catch { case _: Exception => null }
              else null
            current = InternalRow(
              str("op"), str("db"), str("collection"), str("documentKey"),
              str("fullDocument"), str("updatedFields"), tsMicros)
            return true
          }
        } catch { case _: Exception => () } // malformed line: skip (DLQ'd upstream)
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit =
    if (openSource != null) {
      openSource.close()
      openSource = null
    }
}

private[cdcv2] object CdcLog {
  def listFiles(path: String): Seq[String] = {
    val d = new java.io.File(path)
    if (!d.exists()) Seq.empty
    else {
      require(d.isDirectory, s"graft-cdc path must be a directory of log segments, got file: $path")
      // listFiles returns null on I/O errors — surface an empty batch (the
      // next trigger retries) rather than an NPE that kills the query
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && (f.getName.endsWith(".json") || f.getName.endsWith(".jsonl")))
        .map(_.getAbsolutePath)
        .sorted
        .toSeq
    }
  }

  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
