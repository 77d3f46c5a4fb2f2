package graft.data

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The streaming corpus-ingest capstone: the gate every live training-data
  * feed runs BEFORE documents reach storage — cheap scan-fused filters
  * first (token count, language allow-list), then the stateful near-dup
  * gate on the survivors only, so the expensive keyed state never sees
  * obvious junk.
  *
  * Works on batch and streaming frames alike: the accept/reject verdict is
  * pure column expressions (micro-batch friendly, no state), and the
  * near-dup channel is the keyed-state MinHash band gate
  * ([[Dedup.streamingNearDupCandidates]]) for streaming inputs.
  * StreamingIngestSpec pins batch/streaming verdict parity.
  *
  * 100 TB/day shape: one regex tokenization per document (ComputeOnce
  * barrier), zero shuffles for the verdict, and only gate-passing docs pay
  * the signature + band-state exchange — at real feed mix (mostly junk or
  * duplicates) the state pressure tracks ACCEPTED volume, not feed volume.
  */
object CorpusIngest {

  /** Accept/reject verdict as columns: `(original columns, lang, n_tokens,
    * reject_reason)` — reason is NULL for accepted docs, else the FIRST
    * failing gate ('too_short' before 'lang' before 'contaminated'), so a
    * DLQ writer can split on one column ([[graft.core.Dlq]] pattern).
    *
    * `decontamination = Some((bloomModel, n))` adds the at-ingest face of
    * benchmark decontamination: reject any document sharing a word n-gram
    * with the campaign's eval sets, probed against the PREBUILT bloom
    * model ([[Decontaminate.buildBloomModel]], persisted via
    * [[ModelStore]]) riding the plan as a binary literal — no eval scan,
    * no join, one codegen'd hash probe per gram with `exists`
    * short-circuit, and the gate order means only docs that already
    * passed the cheap gates pay it. The bloom's ~3% false positives
    * reject clean docs — the standard ingest trade (losing a sliver of
    * clean feed is cheap; training on the test set is not); false
    * negatives are impossible, so every doc the exact join would flag is
    * rejected. StreamingIngestSpec pins superset-of-exact and
    * batch/streaming parity.
    */
  def verdict(
      docs: DataFrame,
      textCol: String,
      allowedLangs: Seq[String],
      minTokens: Int,
      decontamination: Option[(Array[Byte], Int)] = None
  ): DataFrame = {
    val toked = docs.withColumn(
      "_toks", graft.functions.ComputeOnce(TextAnalysis.tokens(col(textCol))))
    // NULL text first: size(null) is NULL so a bare `<` comparison
    // would skip the gate entirely (and langId on null tokens returns
    // the head profile constant, not 'und' — a null doc would sail
    // through a matching allow-list into storage)
    val cheapGates =
      when(col(textCol).isNull || col("n_tokens") < minTokens, lit("too_short"))
        .when(!col("lang").isin(allowedLangs: _*), lit("lang"))
    val reason = decontamination.fold(cheapGates) { case (model, n) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
      val hit = exists(
        TextAnalysis.ngrams(col("_toks"), n),
        g => ColumnBridge.column(BloomFilterMightContain(
          Literal(model, org.apache.spark.sql.types.BinaryType),
          new XxHash64(Seq(ColumnBridge.expression(g))))))
      cheapGates.when(hit, lit("contaminated"))
    }
    toked
      .withColumn("lang", TextAnalysis.langId(col("_toks")))
      .withColumn("n_tokens", size(col("_toks")))
      .withColumn("reject_reason", reason)
      .drop("_toks")
  }

  /** The EXACT-membership sibling of the bloom at-ingest gate: same gate
    * order and output contract as [[verdict]] (`too_short` before `lang`
    * before `contaminated`, reason NULL for accepted docs), but the
    * contamination verdict is decided by exact n-gram membership against
    * the eval set — a broadcast-sized distinct-gram join, no false
    * positives — instead of the bloom probe.
    *
    * This is the AUDIT face of the gate: fully replayable by a SQL oracle
    * (exact set membership is engine-independent; the bloom's bit layout
    * is not), so the tokenize / lang-id / gate-order plumbing shared with
    * the production bloom face gets a rows+schema+hash correctness row.
    * Production ingest keeps [[verdict]]'s bloom (one corpus pass, one
    * codegen probe per gram, no join); this face pays TWO corpus passes —
    * the verdict-output branch and the gram-probe branch each scan `docs`
    * and tokenize once (they are two sides of a self-join; Spark does not
    * share subplans across join branches, and caching the verdict frame
    * would be wrong at corpus scale). Only the verdict branch runs langId:
    * the probe branch explodes grams for ALL docs rather than filtering to
    * accepted ones — the accepted-only filter was a work-saver, never a
    * semantic gate (the final coalesce lets `too_short`/`lang` win over
    * `contaminated` regardless), and keeping it cost a second full langId
    * pass, which steady-state measurement put at ~2.2× the bloom face;
    * gram rows for would-be-rejected docs are the cheaper price. That
    * second tokenize pass is the audit face's price for SQL replayability.
    * The contaminated-id set is eval-overlap-sized; the join back to the
    * verdict frame is id-keyed, so AQE broadcasts it when small and
    * shuffles safely when a pathological corpus overlaps the eval set
    * wholesale.
    */
  def verdictExact(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      allowedLangs: Seq[String],
      minTokens: Int,
      bench: DataFrame,
      benchTextCol: String,
      n: Int
  ): DataFrame = {
    val base = verdict(docs, textCol, allowedLangs, minTokens, None)
    // the ComputeOnce pin below each explode is load-bearing (the
    // TextAnalysis.ngrams contract): ngrams is a Column BUILDER that
    // substitutes its `toks` argument into the size guard, the sequence
    // bound, and the per-gram transform LAMBDA — an inline tokens(text)
    // there re-runs the regex once per gram, not once per doc (measured
    // 8× on this branch at sf0.1)
    val benchGrams = bench
      .withColumn("_toks", graft.functions.ComputeOnce(TextAnalysis.tokens(col(benchTextCol))))
      .select(explode(TextAnalysis.ngrams(col("_toks"), n)).as("_g"))
      .distinct()
    // no forced broadcast on the gram join: the eval-set gram table is
    // usually broadcast-sized and AQE converts the join at runtime, but a
    // campaign suite with tens of millions of DISTINCT grams must be able
    // to fall back to a shuffled join instead of failing the 8 GB
    // broadcast ceiling (r12 review finding)
    val contaminated = docs
      .withColumn("_toks", graft.functions.ComputeOnce(TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), explode(TextAnalysis.ngrams(col("_toks"), n)).as("_g"))
      .join(benchGrams, Seq("_g"))
      .select(col(idCol))
      .distinct()
      .withColumn("_contaminated", lit(true))
    base
      .join(contaminated, Seq(idCol), "left")
      .withColumn(
        "reject_reason",
        coalesce(col("reject_reason"), when(col("_contaminated"), lit("contaminated"))))
      .drop("_contaminated")
  }

  /** The composed streaming pipeline: (accepted stream, near-dup hit
    * stream). Accepted = verdict-clean docs; the hit stream flags any
    * accepted doc whose MinHash bands collide with an earlier accepted doc
    * in keyed state — the caller subtracts/foreachBatch-joins hits
    * downstream (streams of the same source cannot self-join in one query).
    */
  def ingest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      allowedLangs: Seq[String],
      minTokens: Int,
      dedupTtlMs: Long = 0L,
      decontamination: Option[(Array[Byte], Int)] = None
  ): (DataFrame, Dataset[graft.model.NearDupHit]) = {
    val v = verdict(docs, textCol, allowedLangs, minTokens, decontamination)
    val accepted = v.filter(col("reject_reason").isNull).drop("reject_reason")
    val hits = Dedup.streamingNearDupCandidates(
      accepted.select(col(idCol), col(textCol)), idCol, textCol, ttlMs = dedupTtlMs)
    (accepted, hits)
  }
}
