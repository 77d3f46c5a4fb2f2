package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate routing to named outputs.
  * Semantics from reference pattern/split/ParallelSplitter.java:19-135:
  *  - default mode: first-match-wins, unmatched rows go to "main"
  *  - copyToMain mode: a row is copied to EVERY matching route AND main
  *
  * Spark has no side outputs; the idiomatic equivalents are
  *  - `routed`: one pass, adds a `route` column (first-match) — single scan,
  *    fully codegen'd; downstream can `partitionBy("route")` on write
  *  - `sideOutput(name)`: per-route child DataFrame (Catalyst shares the scan
  *    in batch; in streaming each becomes its own query — or use foreachBatch
  *    + persist + N writes, see graft.jobs.EventRouterJob)
  *  - `exploded`: copy-to-all-matching mode as a generator (route array +
  *    explode), matching the reference's copyToMain broadcast behavior
  */
final case class Route(name: String, predicate: Column)

final case class ParallelSplitter(routes: Seq[Route], mainName: String = "main") {
  require(routes.nonEmpty, "at least one route required")
  require(routes.map(_.name).distinct.size == routes.size, "duplicate route names")
  require(routes.forall(_.name != mainName),
    s"route named '$mainName' would be shadowed by the main (unmatched) output")

  /** NULL predicates must behave as non-matches everywhere: a bare
    * `!(p1 OR p2)` filter evaluates to NULL (= drop) for NULL predicates,
    * so without the coalesce the side outputs silently LOSE rows that
    * `routed` assigns to main — the union of side outputs must equal the
    * input exactly.
    */
  private def matches(r: Route): Column = coalesce(r.predicate, lit(false))

  /** First-match-wins routing expression. Route i matches only if predicates
    * 1..i-1 did not (reference ParallelSplitter.java:118-132).
    */
  def routeExpr: Column =
    routes.foldLeft(lit(null).cast("string")) { (acc, r) =>
      coalesce(acc, when(r.predicate, lit(r.name)))
    } match { case c => coalesce(c, lit(mainName)) }

  /** Single-pass tagged output (first-match-wins). */
  def routed(df: DataFrame): DataFrame = df.withColumn("route", routeExpr)

  /** The reference's getSideOutput(name): rows routed to `name`. */
  def sideOutput(df: DataFrame, name: String): DataFrame = {
    val idx = routes.indexWhere(_.name == name)
    require(idx >= 0 || name == mainName, s"unknown route $name")
    if (name == mainName) df.filter(!routes.map(matches).reduce(_ || _))
    else {
      val notEarlier = routes.take(idx).map(r => !matches(r)).foldLeft(lit(true))(_ && _)
      df.filter(matches(routes(idx)) && notEarlier)
    }
  }

  /** copyToMain mode: one output row per matching route, plus one for main.
    * (reference ParallelSplitter.java:110-117)
    */
  def exploded(df: DataFrame): DataFrame = {
    val tags = routes.map(r => when(r.predicate, lit(r.name))) :+ lit(mainName)
    df.withColumn(
      "route",
      explode(filter(array(tags: _*), x => x.isNotNull))
    )
  }
}
