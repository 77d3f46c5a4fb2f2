package graft.core

import org.apache.spark.sql.DataFrame

/** Fluent pipeline composition facade.
  * Reference core/pipeline/PipelineBuilder.java:8-79: from → parse → apply →
  * enrich → process → to. In Spark the pipeline IS the lazy DataFrame plan —
  * each step just composes transforms, and Catalyst optimizes across the
  * whole chain (the reference executes the chain verbatim; here filter
  * pushdown/pruning cross pattern boundaries for free).
  *
  * Patterns are `DataFrame => DataFrame` (see [[graft.patterns.StreamPattern]]);
  * validation stages return (good, bad) pairs — `applySplit` keeps the DLQ
  * side accumulating while the good side flows on.
  */
final case class PipelineBuilder(df: DataFrame, dlq: Seq[DataFrame] = Seq.empty) {

  def parse(f: DataFrame => DataFrame): PipelineBuilder = copy(df = f(df))

  def apply(pattern: DataFrame => DataFrame): PipelineBuilder = copy(df = pattern(df))

  /** Validation stage returning (good, bad): bad joins the DLQ accumulation. */
  def applySplit(stage: DataFrame => (DataFrame, DataFrame)): PipelineBuilder = {
    val (good, bad) = stage(df)
    PipelineBuilder(good, dlq :+ bad)
  }

  def enrich(f: DataFrame => DataFrame): PipelineBuilder = copy(df = f(df))

  def process(f: DataFrame => DataFrame): PipelineBuilder = copy(df = f(df))

  def deadLetters: Option[DataFrame] = Dlq.union(dlq)

  def to[T](sink: DataFrame => T): T = sink(df)
}

object PipelineBuilder {
  def from(df: DataFrame): PipelineBuilder = PipelineBuilder(df)
}
