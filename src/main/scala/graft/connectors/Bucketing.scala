package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table management — the pre-partitioned co-located join layout.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem⋈orders,
  * events⋈sessions) is shuffling both sides on the join key, every single
  * run. Bucketing pays that shuffle ONCE at write time: both tables are
  * hash-clustered (and sorted) by the key into the same bucket count, so
  * every subsequent join, aggregate or window on that key reads
  * co-partitioned buckets — Catalyst plans the sort-merge join with NO
  * Exchange on either side (a residual local Sort remains: Spark 3+
  * re-sorts bucketed scans rather than trust file order, but over one
  * pre-sorted task-sized file that pass is linear and spill-free). The
  * same layout also drops the exchange from `groupBy(key)` aggregates.
  *
  * `ensureBucketed` is write-once: the first call materializes the bucketed
  * copy and drops a completion marker holding the schema DDL; later calls
  * (including fresh JVMs — the in-memory catalog is empty at startup)
  * re-register the existing files with `CREATE TABLE ... CLUSTERED BY ...
  * LOCATION` and never rewrite. Bucket-count rule at scale: pick
  * size/buckets ≈ one task's comfortable input (~1 GB), and keep the count
  * IDENTICAL across tables that join — mismatched counts shuffle one side.
  */
object Bucketing {

  /** Register (materializing if needed) a bucketed copy of `df` as
    * `tableName` at `path`, clustered and sorted by `keyCol` into
    * `nBuckets`. Returns the bucketed table as a DataFrame.
    */
  def ensureBucketed(
      spark: SparkSession,
      df: => DataFrame,
      tableName: String,
      path: String,
      keyCol: String,
      nBuckets: Int
  ): DataFrame = synchronized {
    if (!spark.catalog.tableExists(tableName)) {
      val marker = new java.io.File(path, "_GRAFT_BUCKETED_DDL")
      if (marker.exists()) {
        val ddl = new String(
          java.nio.file.Files.readAllBytes(marker.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        spark.sql(
          s"""CREATE TABLE $tableName ($ddl) USING PARQUET
             |CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $nBuckets BUCKETS
             |LOCATION '$path'""".stripMargin)
      } else {
        val src = df
        // repartition on the bucket hash first: each task then holds exactly
        // one bucket's keys and writes ONE file per bucket — without this,
        // every write task emits a file into every bucket it has rows for
        // (tasks × buckets small files at scale)
        src
          .repartition(nBuckets, org.apache.spark.sql.functions.col(keyCol))
          .write
          .mode("overwrite")
          .format("parquet")
          .option("path", path)
          .bucketBy(nBuckets, keyCol)
          .sortBy(keyCol)
          .saveAsTable(tableName)
        java.nio.file.Files.write(
          marker.toPath,
          src.schema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.table(tableName)
  }
}
