package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: `bruteTopK` is the exact baseline — it broadcasts the query
  * set (small) against the corpus (huge), so the corpus is scanned once with
  * zero shuffle of the vectors; ranking shuffles only (query, id, score)
  * triples. `bucketedTopK` is the IVF-style path: a coarse bucket column
  * (cluster id / LSH bucket) turns the scan into a bucket-equi join, cutting
  * candidates by the bucket fan-out.
  */
object Similarity {

  /** Cosine similarity of two float/double-array columns — the native
    * codegen'd [[graft.functions.CosineSimilarity]] expression (one fused
    * primitive loop). Accumulation order is left-to-right, bit-identical to
    * the DuckDB oracle's list_reduce replay (and to [[cosineHof]]).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** The higher-order-function formulation (kept as the portable fallback
    * and for cross-checking the native expression in tests).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(ad, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(bd, lit(0.0), (acc, x) => acc + x * x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k neighbors for each query vector (self excluded), ranked by
    * cosine desc with id tie-break.
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c
      .join(q, col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("q_id"),
        col("n_id"),
        col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6")
      )
  }

  /** IVF-style ANN: candidates restricted to the query's coarse bucket. */
  def bucketedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col(bucketCol).as("q_bk")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col(bucketCol).as("n_bk"))
    val scored = c
      .join(q, col("n_bk") === col("q_bk") && col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("q_id"),
        col("n_id"),
        col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6")
      )
  }
}
