package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage surface: one entry per implemented
  * operator from SURVEY.md §2 (plus the training-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's hash-match.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the end-to-end MongoToKafka CDC pipeline (parse →
    * filter → dedup → change-suppression → schema gate → observe →
    * decorate → trace stamping).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.JobQueries.jobMongoToKafka(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.PatternQueries.queries ++
      graft.queries.StatefulQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.DataQueries.queries ++
      graft.queries.JobQueries.queries ++
      graft.queries.SourceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.PatternQueries.oracles ++
      graft.queries.StatefulQueries.oracles ++
      graft.queries.JoinQueries.oracles ++
      graft.queries.DataQueries.oracles ++
      graft.queries.JobQueries.oracles ++
      graft.queries.SourceQueries.oracles
}
