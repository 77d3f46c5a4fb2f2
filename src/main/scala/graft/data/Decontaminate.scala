package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with an evaluation/benchmark set — the standard "don't train on
  * the test set" pass of an LLM data pipeline.
  *
  * Scale shape: the benchmark side (eval sets are small — thousands of
  * documents, not billions) collapses to DISTINCT n-grams and BROADCASTS;
  * the corpus side is one scan that explodes n-grams and probes the
  * broadcast hash table, so the 100 TB side never shuffles its text. The
  * only shuffle is the final per-doc hit count on the (already tiny)
  * matching rows. Production would hash grams to 64-bit before the join;
  * here grams join as strings so the DuckDB oracle replays byte-identically.
  */
object Decontaminate {

  /** Word n-grams of `textCol` as an array column. The token array is
    * pinned with [[graft.functions.ComputeOnce]]: without the barrier,
    * CollapseProject substitutes the tokenizer INTO the per-element gram
    * lambda — one full regex re-split of the document per gram index
    * (O(words²) regex work per doc; measured 6.5 s → 0.6 s at sf0.1).
    */
  private def withGrams(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("_toks", graft.functions.ComputeOnce(TextAnalysis.tokens(col(textCol))))
      .withColumn("_grams", TextAnalysis.ngrams(col("_toks"), n))

  /** Per-doc contamination hits: (idCol, n_hits) for every training doc
    * sharing at least one n-gram with `bench`. Clean docs are absent —
    * anti-join the result against the corpus to keep the clean side.
    */
  def hits(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val benchGrams = withGrams(bench, textCol, n)
      .select(explode(col("_grams")).as("_g"))
      .distinct()
    withGrams(train, textCol, n)
      .select(col(idCol), explode(col("_grams")).as("_g"))
      .join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("_g")).as("n_hits"))
  }

  /** Graded contamination REPORT: per training doc, its distinct n-gram
    * count, the count hitting the benchmark set, and the overlap fraction,
    * thresholded — the graded form of the standard n-gram-overlap
    * contamination metric: a doc is flagged when a meaningful FRACTION of
    * its grams appears in the eval set, not on a single stray collision
    * (the [[hits]] face's any-hit semantics). Every doc with at least one
    * gram appears in the output (zero-hit docs carry overlap 0.0); docs
    * shorter than n tokens have no grams and are absent — nothing to
    * measure.
    *
    * Scale shape: distinct eval grams still broadcast; the corpus scans
    * once, dedups its grams PER ROW (`array_distinct` — no shuffle), and
    * the per-doc aggregate map-side-combines to one row per doc before the
    * only shuffle. The hit marker rides a left join against the broadcast,
    * so clean docs never leave their scan partition un-aggregated.
    */
  def overlap(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    require(threshold >= 0.0 && threshold <= 1.0, s"threshold out of [0,1]: $threshold")
    val benchGrams = withGrams(bench, textCol, n)
      .select(explode(col("_grams")).as("_g"))
      .distinct()
      .withColumn("_hit", lit(1L))
    withGrams(train, textCol, n)
      .withColumn("_dg", array_distinct(col("_grams")))
      .select(col(idCol), size(col("_dg")).cast("long").as("n_grams"), explode(col("_dg")).as("_g"))
      .join(broadcast(benchGrams), Seq("_g"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hits"))
      .withColumn("overlap", col("n_hits").cast("double") / col("n_grams"))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  /** Multi-benchmark decontamination in ONE corpus scan. A real campaign
    * screens against MANY eval sets at once (every benchmark in the
    * harness), and the naive loop re-scans the 100 TB corpus once per set.
    * Here every eval set's distinct grams are tagged with the set name,
    * union'd into one (gram, eval_set) index — still eval-sized, still one
    * broadcast — and the corpus explodes its grams exactly once, probing
    * all sets in the same join. Output grain is (doc, eval_set): per-set
    * distinct-gram hit counts, ready for per-benchmark thresholds.
    * N-set screening costs one corpus pass instead of N.
    */
  def hitsMulti(
      train: DataFrame,
      benches: Seq[(String, DataFrame)],
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    require(benches.nonEmpty, "hitsMulti: need at least one benchmark set")
    // unlike [[hits]], grams travel as 60-bit md5 shingle hashes
    // ([[graft.functions.ShingleHash60]], per-doc distinct by construction):
    // an 8-byte broadcast key + probe instead of a ~25-char string, and the
    // per-(doc,set) hit count degrades to a plain count. Collisions replay
    // identically in the oracle's md5, so results still bit-match (the
    // shingleRows precedent). Short docs contribute their one partial
    // shingle (shingle semantics), where the string face drops them.
    def gramHashes(df: DataFrame) =
      df.select(
        col(idCol),
        explode(graft.functions.ShingleHash60(TextAnalysis.tokens(col(textCol)), n)).as("_gh"))
    val benchGrams = benches
      .map { case (name, bench) =>
        gramHashes(bench)
          .select(col("_gh")).distinct()
          .select(lit(name).as("eval_set"), col("_gh"))
      }
      .reduce(_ unionByName _)
    gramHashes(train)
      .join(broadcast(benchGrams), Seq("_gh"))
      .groupBy(col(idCol), col("eval_set"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[hits]] with a BLOOM-FILTER pre-probe on the corpus side — the shape
    * production decontamination takes at 100 TB. The broadcast hash join in
    * [[hits]] ships every corpus gram row into the join; here a bloom
    * filter over the benchmark grams (Spark's own
    * `BloomFilterAggregate` / `might_contain` pair, the machinery behind
    * its injected runtime row-filters) is built ONCE as a scalar subquery —
    * no driver collect — and the corpus-side scan drops ~all clean grams
    * with one codegen'd hash probe each, BEFORE any join machinery sees
    * them. False positives don't matter for correctness: survivors still
    * pass the exact broadcast join, so the output is byte-identical to
    * [[hits]] — the bloom only prunes.
    *
    * `expectedGrams` sizes the filter (bits ~ 1.44 * n * log2(1/fpp)); at
    * the default 3% fpp a 10M-gram eval set is a ~9 MB broadcast.
    */
  def hitsBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      expectedGrams: Long = 1L << 22
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    require(expectedGrams > 0, s"expectedGrams must be positive, got $expectedGrams")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val benchGrams = withGrams(bench, textCol, n)
      .select(explode(col("_grams")).as("_g"))
      .distinct()
    val bloomDF = benchGrams.select(
      ColumnBridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(ColumnBridge.expression(col("_g")))),
          expectedGrams
        ).toAggregateExpression()
      ).as("bloom"))
    val probe = (g: Column) =>
      ColumnBridge.column(
        BloomFilterMightContain(
          ScalarSubquery(bloomDF.queryExecution.analyzed),
          new XxHash64(Seq(ColumnBridge.expression(g)))))
    withGrams(train, textCol, n)
      .select(col(idCol), explode(col("_grams")).as("_g"))
      .filter(probe(col("_g")))
      .join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("_g")).as("n_hits"))
  }

  /** Build the campaign-level bloom model ONCE: the serialized bloom over
    * the benchmark's distinct n-grams. An eval set is fixed for the life of
    * a decontamination campaign while the training corpus arrives in many
    * batches/queries — rebuilding the bloom per run repays the whole eval
    * scan every time (the measured data-proportional cost of the
    * scalar-subquery face). The model is driver state of
    * ~1.44·n·log2(1/fpp) bits (a 10M-gram eval set at 3% fpp is ~9 MB) —
    * the same "fetch the trained model" collect the IVF centroids use, NOT
    * a data collect.
    */
  /** `expectedGrams` ≤ 0 means AUTO: count the benchmark's distinct grams
    * first and size the filter to the measurement. The default 2²² sizing
    * that [[hitsBloom]] uses inline would hand a ~1k-gram eval set a
    * ~4 MB filter — a 4 MB literal serialized into EVERY task binary of
    * every consuming stage, and a probe working set that falls out of L2.
    * Right-sized, the same eval set is a few KB (1.44·n·log2(1/fpp) bits),
    * and since the eval scan already runs once per campaign to build the
    * filter, the extra counting pass is one cheap job over the (small,
    * fixed) eval set. False-positive rate is unchanged (3% at the measured
    * n); output stays byte-identical either way — the bloom only prunes.
    */
  def buildBloomModel(
      bench: DataFrame,
      textCol: String,
      n: Int,
      expectedGrams: Long = -1L
  ): Array[Byte] = {
    require(n > 0, s"n-gram size must be positive, got $n")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val grams = withGrams(bench, textCol, n)
      .select(explode(col("_grams")).as("_g"))
      .distinct()
    val sized =
      if (expectedGrams > 0) expectedGrams
      else math.max(grams.count(), 64L)
    grams
      .select(
        ColumnBridge.column(
          new BloomFilterAggregate(
            new XxHash64(Seq(ColumnBridge.expression(col("_g")))),
            sized
          ).toAggregateExpression()
        ).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** [[hitsBloom]] with a prebuilt model ([[buildBloomModel]]): the bloom
    * rides the plan as a binary literal, so the per-run cost is the corpus
    * probe + the exact broadcast join only. Output byte-identical to
    * [[hits]] for the same inputs — the bloom remains a pure pruner.
    */
  def hitsBloomWith(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bloomModel: Array[Byte]
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    val benchGrams = withGrams(bench, textCol, n)
      .select(explode(col("_grams")).as("_g"))
      .distinct()
    val probe = (g: Column) =>
      ColumnBridge.column(
        BloomFilterMightContain(
          Literal(bloomModel, org.apache.spark.sql.types.BinaryType),
          new XxHash64(Seq(ColumnBridge.expression(g)))))
    withGrams(train, textCol, n)
      .select(col(idCol), explode(col("_grams")).as("_g"))
      .filter(probe(col("_g")))
      .join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("_g")).as("n_hits"))
  }

  /** The one-call clean face: `train` minus every contaminated doc (LEFT
    * ANTI join on the hit list — the id-only hit frame joins, the text
    * column never shuffles).
    */
  def clean(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame =
    train.join(
      hits(train, bench, idCol, textCol, n).select(col(idCol)),
      Seq(idCol),
      "left_anti")
}
