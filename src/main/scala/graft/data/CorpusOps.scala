package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly operators for training-data pipelines: deterministic
  * stratified sampling (corpus mixing) and concat-and-chunk sequence
  * packing. Both are pure column/window expressions — no UDFs, no driver
  * loops — and both are oracle-replayable (the sampling decision and the
  * packing layout are functions of the data alone, not of partitioning).
  */
object CorpusOps {

  /** Deterministic per-stratum sampling — the "mix 30% web, 5% code, ..."
    * step of corpus assembly. A row survives iff
    * `md5_60(stratum|id) % 1e6 < rate(stratum) * 1e6`: the verdict is a pure
    * function of (stratum, id), so it is reproducible across runs, clusters
    * and partitionings, and a re-run after adding documents keeps every
    * previously-kept row (stable sampling — what makes incremental corpus
    * rebuilds diff-able). Scale shape: embarrassingly parallel scan, no
    * shuffle; the rate map broadcasts as a literal.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double
  ): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val rate = coalesce(element_at(rateMap, col(stratumCol)), lit(defaultRate))
    val ticket = pmod(
      graft.functions.Md5Hash60(concat(col(stratumCol), lit("|"), col(idCol).cast("string"))),
      lit(1000000L))
    // explicit floor: a bare cast(double -> long) truncates while SQL
    // engines' CAST rounds — for a rate like 0.3 (0.3*1e6 = 299999.99…)
    // that is an off-by-one threshold divergence vs any SQL replay
    df.withColumn("_ticket", ticket)
      .filter(col("_ticket") < floor(rate * 1e6).cast("long"))
      .drop("_ticket")
  }

  /** Deterministic corpus shuffle for distributed training readers: each
    * doc gets a (reader shard, within-shard position) from a seeded hash —
    * the "globally shuffled training order" step, WITHOUT a global sort.
    *
    * shard = hash60(seed|id) % nShards spreads docs uniformly; position is
    * a row_number windowed PER SHARD over (hash, id) — N independent
    * in-partition sorts instead of one total-order sort that would
    * serialize 100 TB through a single range partitioner. Changing the seed
    * reshuffles every epoch reproducibly; the layout is a pure function of
    * (seed, id), independent of cluster size or partitioning.
    *
    * SIZE nShards FOR THE DATA, not the reader count: each shard sorts in
    * ONE task, so pick nShards such that corpus/nShards fits a task
    * comfortably (at 100 TB that means thousands of shards, e.g. 10k ×
    * ~10 GB) and assign each training reader a contiguous RANGE of shards.
    * A handful of shards over a huge corpus would degrade to a handful of
    * giant single-task sorts.
    */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      seed: String,
      nShards: Int
  ): DataFrame = {
    require(nShards > 0, s"shuffleShards: nShards must be positive, got $nShards")
    val h = graft.functions.Md5Hash60(
      concat(lit(seed), lit("|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Sliding-window document chunking with overlap — the "split long docs
    * into `chunkTokens`-token pieces every `strideTokens`" step of RAG
    * indexing and long-context pretraining. Chunk k covers token offsets
    * [k*stride, k*stride + chunk); the trailing chunk may be shorter; empty
    * docs emit nothing.
    *
    * Scale shape: pure per-row explode fused with the scan — no shuffle;
    * output size is input tokens × (chunk/stride) overlap factor, stated so
    * the blow-up is a deliberate knob, not a surprise.
    */
  /** Window count shared by [[chunkDocs]] (which EMITS the chunk indices)
    * and [[stripBoilerplate]] (which rebuilds docs from those indices) —
    * one definition so the two index spaces can never desync. Standard
    * sliding-window count: stop once a window reaches the end of the doc —
    * ceil(n/stride) would emit trailing chunks fully contained in their
    * predecessor (pure duplicates in a RAG index).
    */
  private[data] def chunkCount(nTokens: Column, chunkTokens: Int, strideTokens: Int): Column =
    floor(
      (greatest(nTokens - chunkTokens, lit(0)) + lit(strideTokens - 1)) / lit(strideTokens)
    ) + 1

  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int
  ): DataFrame = {
    require(chunkTokens > 0, s"chunkDocs: chunkTokens must be positive, got $chunkTokens")
    require(
      strideTokens > 0 && strideTokens <= chunkTokens,
      s"chunkDocs: stride must be in [1, chunkTokens], got $strideTokens")
    val n = size(col("_toks"))
    val nChunks = chunkCount(n, chunkTokens, strideTokens).cast("int")
    // ComputeOnce: the token array feeds the explode bound AND every chunk
    // slice — without the barrier the tokenizer would inline into each
    df.withColumn("_toks", graft.functions.ComputeOnce(graft.data.TextAnalysis.tokens(col(textCol))))
      .withColumn(
        "_k",
        explode(
          when(n > 0, sequence(lit(0), nChunks - 1))
            .otherwise(array().cast("array<int>"))))
      .withColumn(
        "_chunk_toks",
        slice(col("_toks"), col("_k") * strideTokens + 1, lit(chunkTokens)))
      .select(
        col(idCol),
        col("_k").cast("long").as("chunk_idx"),
        array_join(col("_chunk_toks"), " ").as("chunk"),
        size(col("_chunk_toks")).cast("long").as("n_chunk_tokens"))
  }

  /** Token-budget corpus selection — "fill a B-token training budget with
    * the best-scoring documents": greedy by (score desc, id asc), keep the
    * prefix whose running token total stays ≤ budget (the cumsum is
    * monotone, so the filter IS the prefix).
    *
    * Scale shape: a global ordered cumsum would serialize the corpus
    * through one partition, so selection runs in two phases that provably
    * pick the SAME set: (1) per-band token totals (band = score/bandWidth,
    * monotone in score) — a small aggregate collected to the driver; (2)
    * bands wholly under budget are kept with no per-doc work at all, and
    * ONLY the single boundary band runs a windowed cumsum (partitioned by
    * its band). Size bandWidth so one band is task-sized.
    *
    * Contract: `scoreCol` is INTEGRAL — it is cast to long, so fractional
    * scores are truncated toward zero before ranking (matching the oracle).
    * Pre-scale fractional scores (e.g. `round(score * 1e6)`) if sub-integer
    * resolution matters. Banding uses integral floor-division, so it is
    * exact over the full long range (no double-precision 2^53 cliff).
    */
  def selectByTokenBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      tokenCountCol: Column,
      budget: Long,
      bandWidth: Long
  ): DataFrame = {
    require(budget >= 0, s"selectByTokenBudget: budget must be >= 0, got $budget")
    require(bandWidth > 0, s"selectByTokenBudget: bandWidth must be positive, got $bandWidth")
    // null score/tokens rows are unrankable — excluded up front (a null
    // band would NPE the driver walk; the oracle's cumsum skips them too)
    val base = df
      .withColumn("_score", scoreCol.cast("long"))
      .withColumn("_tok", tokenCountCol.cast("long"))
      .filter(col("_score").isNotNull && col("_tok").isNotNull)
      // floor-division in LONG arithmetic: _score - pmod(...) is exactly
      // divisible by bandWidth, so integral DIV equals mathematical floor
      // for negative scores too — `floor(a / b)` would round through a
      // double and mis-band |score| > 2^53
      .withColumn(
        "_band",
        expr(s"CAST((_score - pmod(_score, ${bandWidth}L)) DIV ${bandWidth}L AS BIGINT)"))
    // phase 1: model-sized driver state — one (band, tokens) row per band
    val totals = base
      .groupBy(col("_band"))
      .agg(sum(col("_tok")).as("_t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)(Ordering[Long].reverse) // NOT sortBy(-x): -Long.MinValue overflows
    var cum = 0L
    var boundary = Long.MinValue
    var before = 0L
    val it = totals.iterator
    var done = false
    while (it.hasNext && !done) {
      val (band, t) = it.next()
      if (cum + t <= budget) cum += t
      else { boundary = band; before = cum; done = true }
    }
    val out = base.select(
      col(idCol), col("_score").as("score"), col("_tok").as("n_tokens"), col("_band"))
    val selected =
      if (!done) out // every band fits
      else {
        val whole = out.filter(col("_band") > boundary)
        val w = Window
          .partitionBy(col("_band"))
          .orderBy(col("score").desc, col(idCol).asc)
        val partial = out
          .filter(col("_band") === boundary)
          .withColumn("_cum", sum(col("n_tokens")).over(w))
          .filter(col("_cum") + before <= budget)
          .drop("_cum")
        whole.unionByName(partial)
      }
    selected.drop("_band")
  }

  /** Concat-and-chunk sequence packing: documents are laid end-to-end per
    * shard (deterministic order) and cut into fixed `budget`-token
    * sequences; each doc reports the sequence it starts in and its offset
    * there. This is the standard "pack short documents into full training
    * sequences" step.
    *
    * Scale shape: the running sum is windowed PER SHARD, not global — a
    * global cumulative sum would serialize 100 TB through one partition.
    * Shards are `id % nShards`, so layout is reproducible regardless of
    * cluster size; one shuffle on the shard key, then a linear in-partition
    * window.
    */
  /** `carryCols`: extra input columns to keep on the output — computing them
    * upstream and carrying them through beats joining the packed layout back
    * onto the source frame, which would re-execute the whole upstream plan
    * on both join sides.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Int,
      nShards: Int,
      carryCols: Seq[String] = Seq.empty
  ): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    // seq_id packs (shard, per-shard sequence index) into one long as
    // shard << 44 | index: 2^44 ≈ 1.8e13 sequences per shard (≈ 9e15 tokens
    // at budget=512) before the runtime guard below fires, and up to 2^19
    // shards before the shard bits overflow the sign bit. The previous
    // shard*1e6 layout collided once a shard passed 1e6 sequences (~512M
    // tokens) — far below a 100 TB corpus.
    require(
      nShards > 0 && nShards <= (1 << 19),
      s"packSequences: nShards must be in [1, 2^19], got $nShards")
    val shard = pmod(col(idCol).cast("long"), lit(nShards.toLong))
    val w = Window.partitionBy(col("_shard")).orderBy(col(idCol))
    val before = coalesce(
      sum(col("_tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val seqIdx = floor(col("_before") / budget)
    // data-dependent overflow check: fails the job loudly instead of
    // silently spilling shard k's ids into shard k+1's namespace
    val guardedIdx = seqIdx +
      coalesce(
        assert_true(
          seqIdx < lit(1L << 44),
          lit(s"packSequences: per-shard sequence index exceeds 2^44")).cast("long"),
        lit(0L))
    df.withColumn("_shard", shard)
      .withColumn("_tok", tokenCountCol.cast("long"))
      .withColumn("_before", before)
      .select(
        col(idCol) +:
          col("_shard").as("shard") +:
          col("_tok").as("n_tokens") +:
          (shiftleft(col("_shard"), 44) + guardedIdx).as("seq_id") +:
          pmod(col("_before"), lit(budget.toLong)).as("seq_offset") +:
          carryCols.map(col): _*
      )
  }

  /** Per-group document cap — the "at most N docs per domain/source" rule
    * every web-scale corpus applies so no single origin dominates the mix.
    * Keeps the top `n` rows per group by (scoreCol desc, idCol asc): the
    * unique id tiebreak makes the cut deterministic and hash-matchable.
    *
    * Scale shape: one exchange on the group key, one in-partition sort —
    * rank never leaves its group's task, and callers project to
    * (group, score, id) + the carried columns before the shuffle so the
    * 100 TB text never moves. A pathological mega-group concentrates its
    * sort in one task; at that point cap the group upstream with a cheap
    * uniform pre-sample (keep > n× the cap) before the exact rank.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      n: Int
  ): DataFrame = {
    require(n > 0, s"capPerGroup: n must be positive, got $n")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("cap_rank", row_number().over(w).cast("long"))
      .filter(col("cap_rank") <= n)
  }

  /** Deterministic train/val/test split assignment: each row draws a
    * uniform md5 ticket from (seed, id) and lands in the first split whose
    * cumulative-fraction threshold exceeds it. The verdict is a pure
    * function of (seed, id) — independent of corpus size, ordering and
    * partitioning — so growing the corpus NEVER migrates an existing doc
    * between splits: the eval set stays eval forever, which is what keeps
    * a rebuilt training corpus leak-free. Changing the seed redraws the
    * whole assignment. Scale shape: embarrassingly parallel scan, zero
    * shuffle; thresholds fold into the codegen'd when-chain as literals.
    *
    * `splits` are (name, fraction) with fractions summing to ~1; the last
    * split absorbs rounding, so every row gets exactly one label.
    */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: String
  ): DataFrame = {
    require(splits.size >= 2, s"assignSplits: need at least 2 splits, got ${splits.size}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"assignSplits: fractions must sum to 1, got $total")
    val ticket = pmod(
      graft.functions.Md5Hash60(concat(lit(seed), lit("|"), col(idCol).cast("string"))),
      lit(1000000L))
    // integer ppm thresholds (floor, like stratifiedSample) — exact and
    // SQL-replayable; the final otherwise() absorbs the rounding remainder
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val thresholds = cum.init.map(c => math.floor(c * 1e6).toLong)
    val verdict = splits.init.zip(thresholds).foldRight(lit(splits.last._1)) {
      case (((name, _), t), rest) => when(ticket < t, lit(name)).otherwise(rest)
    }
    df.withColumn("split", verdict)
  }

  /** C4-style boilerplate removal: a chunk (non-overlapping `chunkTokens`
    * token run — the corpus's paragraph stand-in) that appears in at least
    * `minDocs` DISTINCT documents is boilerplate (nav bars, license
    * headers, cookie banners); every occurrence is stripped and the
    * surviving chunks are re-joined in order. Emits per doc: chunk counts
    * and the cleaned text.
    *
    * Scale shape: the boilerplate verdict travels as (md5, doc_id,
    * chunk_idx) rows — the text is hashed in-scan and never shuffles for
    * the counting pass. The boilerplate SET (distinct chunks above the
    * threshold) is tiny by construction — boilerplate is few distinct
    * strings repeated often — so the verdict join broadcasts it. The one
    * text-bearing exchange is the final doc-grain join of documents
    * against their removed-index lists, i.e. the op's own output grain: a
    * corpus rewrite moves the corpus once, nothing more. The rebuild is a
    * HOF over the token array (filter surviving chunk windows, flatten,
    * join) — codegen, no UDF.
    */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      minDocs: Int
  ): DataFrame = {
    require(minDocs >= 2, s"stripBoilerplate: minDocs must be >= 2, got $minDocs")
    // chunks travel as 60-bit md5 hashes (8-byte keys through the counting
    // exchange, not 32-char hex strings) — collisions replay identically in
    // the oracle's md5, so the verdict still bit-matches (shingleRows rule)
    val chunks = chunkDocs(df, idCol, textCol, chunkTokens, chunkTokens)
      .select(col(idCol), col("chunk_idx"), graft.functions.Md5Hash60(col("chunk")).as("_h"))
    val boilerplate = chunks
      .select(col("_h"), col(idCol)).distinct()
      .groupBy(col("_h")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_h"))
    val removed = chunks
      .join(boilerplate, Seq("_h"))
      .groupBy(col(idCol))
      .agg(collect_set(col("chunk_idx")).as("_removed"))
    val toks = graft.functions.ComputeOnce(graft.data.TextAnalysis.tokens(col(textCol)))
    val n = size(col("_toks"))
    val nChunks = chunkCount(n, chunkTokens, chunkTokens).cast("long")
    val removedSafe = coalesce(col("_removed"), array().cast("array<long>"))
    val keptIdx = filter(
      when(n > 0, sequence(lit(0L), nChunks - 1)).otherwise(array().cast("array<bigint>")),
      i => !array_contains(removedSafe, i))
    val cleaned = array_join(
      flatten(transform(keptIdx, i =>
        slice(col("_toks"), (i * chunkTokens + 1).cast("int"), lit(chunkTokens)))),
      " ")
    df.join(removed, Seq(idCol), "left")
      .withColumn("_toks", toks)
      .select(
        col(idCol),
        when(n > 0, nChunks).otherwise(lit(0L)).as("n_chunks"),
        size(removedSafe).cast("long").as("n_removed"),
        cleaned.as("cleaned"))
  }

  /** Hashed n-gram importance weights for domain reweighting — the data-
    * SELECTION step of corpus assembly (DSIR: Xie/Santurkar/Ma/Liang,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every raw document by how much its hashed
    * token distribution looks like a TARGET domain (`targetPred` rows)
    * versus the raw corpus overall. High-weight docs are "target-like"
    * crawl — the docs importance resampling pulls into the mix.
    *
    * Model: one aggregation pass over exploded tokens builds per-bucket
    * counts under both distributions — `rc` (raw) and `tc` (target ⊆ raw,
    * via conditional sum) — map-side combinable to ≤ `nBuckets` rows per
    * partition, so the shuffle is model-sized at any corpus size. The
    * model (+ its exact integer totals) collects to the driver (bounded
    * by `nBuckets`, the codebook precedent) and re-enters the scoring
    * scan as two map literals: scoring is then a single corpus scan with
    * ZERO joins and ZERO shuffles.
    *
    * Per-gram weight is the RATIONAL smoothed likelihood ratio
    * `((tc+0.5)/(tT+0.5B)) / ((rc+0.5)/(rT+0.5B))`, summed per doc in a
    * pinned left fold over token positions — NOT the paper's sum of log
    * ratios: `ln` is not correctly-rounded and cannot cross the oracle
    * bit-exactly, while +,*,/ are IEEE-exact in any engine (the
    * `bm25TopK` precedent, same trade-off: per-gram monotone transform,
    * heavier weight on extreme-ratio grams in the mix). Output
    * `(id, n_grams, imp_e6, imp_mean_e6)` — the raw fold and its
    * per-gram mean (floor·1e6 longs), so selection can rank
    * length-normalized.
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      nBuckets: Int = 4096,
      maxN: Int = 2
  ): DataFrame =
    importanceWeightsWith(
      df, idCol, textCol, trainImportanceModel(df, textCol, targetPred, nBuckets, maxN))

  /** Adds column `out` = the hashed feature list of one document: word
    * unigrams, then (for `maxN = 2`, the paper's feature set) space-joined
    * word bigrams, in that pinned order — the order IS the scoring fold
    * order, so train and apply must share this definition exactly.
    *
    * TWO pinned projections, per the [[graft.data.TextAnalysis.ngrams]]
    * contract: the token array materializes as a real attribute BEFORE the
    * bigram lambda references it (a raw tokenizer expression inside the
    * lambda re-runs the regex split per element — the O(words²) trap that
    * made the r15 maxN=2 flip 8× slower than its unigram floor), and the
    * gram list itself is ComputeOnce-pinned so downstream `size`/fold
    * references read the attribute instead of re-concatenating.
    */
  private def withGrams(df: DataFrame, textCol: String, maxN: Int, out: String): DataFrame = {
    val t0 = "_imp_t0"
    // the temp names are fixed (they are part of the fold contract above);
    // an input that already carries one would be silently overwritten and
    // dropped — fail loudly instead (ADVICE r16)
    Seq(t0, out).foreach(c =>
      require(!df.columns.contains(c),
        s"importanceWeights: input already has a column named '$c' — it would be " +
          "silently overwritten by the gram machinery; rename it upstream"))
    val toks = graft.functions.ComputeOnce(
      graft.data.TextAnalysis.tokens(col(textCol)))
    val grams =
      if (maxN == 1) col(t0)
      else concat(col(t0), graft.data.TextAnalysis.ngrams(col(t0), 2))
    df.withColumn(t0, toks)
      .withColumn(out, graft.functions.ComputeOnce(grams))
      .drop(t0)
  }

  /** Train the hashed-gram importance model and serialize it — the
    * CAMPAIGN half of [[importanceWeights]] (the decontaminate-bloom /
    * ANN-codebook precedent): train once per (corpus snapshot, target,
    * nBuckets, maxN) through `ModelStore.bytesOrTrain`, then every run in
    * any JVM pays only the scoring scan. Format: magic `IMP2` (format
    * version — the bytes changed shape in r15 when maxN was added, and a
    * stale-format store file must fail LOUDLY, not misparse), nBuckets,
    * maxN, entry count, then (bucket, rc, tc) longs sorted by bucket —
    * deterministic bytes for a deterministic model.
    *
    * `maxN = 2` (unigrams + bigrams, the DSIR paper's feature set) is the
    * default because it is MEASURED better, not assumed: recovering the
    * `src0` target domain on the sf0.01 corpus, unigram-only weights rank
    * a (target, non-target) pair correctly 0.790 of the time; adding
    * bigrams lifts that to 0.997 (SCALE.md r15) — word-pair statistics
    * carry the domain signal single words wash out.
    */
  def trainImportanceModel(
      df: DataFrame,
      textCol: String,
      targetPred: Column,
      nBuckets: Int = 4096,
      maxN: Int = 2
  ): Array[Byte] = {
    require(maxN == 1 || maxN == 2,
      s"trainImportanceModel: maxN=$maxN — 1 (unigrams) or 2 (+bigrams, the DSIR feature set)")
    // the model collects driver-side and re-enters the plan as two map
    // LITERALS (~16 B/bucket) — loud ceiling per the flood-guard stance
    // (maxBucketRows/maxBroadcastRows): a runaway bucket count turns the
    // driver into the bottleneck, and past ~2^20 hashing collisions are
    // not the binding error term anyway
    require(
      nBuckets > 0 && nBuckets <= (1 << 20),
      s"trainImportanceModel: nBuckets=$nBuckets outside (0, ${1 << 20}] — " +
        "the model is driver-resident plan material; DSIR operates at ~10^4 buckets")
    val bucket = pmod(graft.functions.Md5Hash60(col("_tok")), lit(nBuckets.toLong))
    val model = withGrams(df, textCol, maxN, "_g")
      .select(explode(col("_g")).as("_tok"), targetPred.cast("long").as("_is_t"))
      .groupBy(bucket.as("_b"))
      .agg(count(lit(1)).as("_rc"), sum(col("_is_t")).as("_tc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // deterministic bytes + literal arrays (lookup is order-free)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(ImpModelMagic)
    out.writeInt(nBuckets)
    out.writeInt(maxN)
    out.writeInt(model.length)
    model.foreach { case (b, rc, tc) =>
      out.writeLong(b); out.writeLong(rc); out.writeLong(tc)
    }
    out.flush()
    bos.toByteArray
  }

  /** Serialized-model format version ([[trainImportanceModel]]): "IMP2". */
  private[graft] val ImpModelMagic: Int = 0x494d5032

  /** Apply a serialized importance model ([[trainImportanceModel]]) — one
    * shuffle-free scoring scan; output identical to [[importanceWeights]]
    * trained on the same corpus (spec-pinned byte round-trip).
    *
    * Scale shape (the r15 verdict's fix, all three mechanical): the model
    * enters the plan as two DENSE `nBuckets`-length ARRAY literals indexed
    * by bucket — `element_at(array, i)` is an O(1) ordinal access where
    * `GetMapValue` on a map LITERAL is an O(nBuckets) linear key scan per
    * lookup (~4×10¹⁰ comparisons at sf0.1, the round-15 8.5–9.6× floor
    * breach). Each gram is md5-hashed to its bucket exactly ONCE (a
    * `transform` to an index array; the old tree hashed twice per term,
    * once per map), and the fold is computed exactly once behind
    * [[graft.functions.ComputeOnce]] (the old plan duplicated the whole
    * `aggregate` across the two output columns). Per-gram cost is now
    * O(1) regardless of nBuckets — at DSIR's ~10⁴ buckets on a 100 TB
    * corpus the scan stays tokenize-bound, not lookup-bound.
    */
  def importanceWeightsWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      modelBytes: Array[Byte]
  ): DataFrame = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(modelBytes))
    require(modelBytes.length >= 16 && in.readInt() == ImpModelMagic,
      "importanceWeightsWith: model bytes lack the IMP2 magic — a stale-format " +
        "(pre-maxN) ModelStore file or foreign bytes; retrain via trainImportanceModel")
    val nBuckets = in.readInt()
    val maxN = in.readInt()
    require(nBuckets > 0 && nBuckets <= (1 << 20) && (maxN == 1 || maxN == 2),
      s"importanceWeightsWith: implausible header (nBuckets=$nBuckets, maxN=$maxN) — corrupt model bytes")
    val nEntries = in.readInt()
    require(nEntries >= 0 && nEntries <= nBuckets && modelBytes.length == 16 + 24 * nEntries,
      s"importanceWeightsWith: ${modelBytes.length} bytes for $nEntries entries — " +
        s"expected exactly ${16 + 24 * nEntries}; corrupt or stale-format model")
    Seq("_fold").foreach(c =>
      require(!df.columns.contains(c),
        s"importanceWeightsWith: input already has a column named '$c' — it would be " +
          "silently overwritten by the scoring fold; rename it upstream"))
    val model = Array.fill(nEntries)((in.readLong(), in.readLong(), in.readLong()))
    val tT = model.map(_._3).sum
    val rT = model.map(_._2).sum
    // dense bucket-indexed count arrays; absent buckets are genuine zeros
    val rcArr = new Array[Long](nBuckets)
    val tcArr = new Array[Long](nBuckets)
    model.foreach { case (b, rc, tc) =>
      require(b >= 0 && b < nBuckets, s"importanceWeightsWith: bucket $b outside [0, $nBuckets)")
      rcArr(b.toInt) = rc; tcArr(b.toInt) = tc
    }
    val rcLit = lit(rcArr)
    val tcLit = lit(tcArr)
    // exact-integer inputs to an identical expression tree on both engines
    val tDen = lit(tT.toDouble + 0.5 * nBuckets)
    val rDen = lit(rT.toDouble + 0.5 * nBuckets)
    def term(b: Column): Column =
      ((element_at(tcLit, b).cast("double") + 0.5) / tDen) /
        ((element_at(rcLit, b).cast("double") + 0.5) / rDen)
    // 1-based ordinals into the dense arrays, each gram hashed exactly once
    val bkts = transform(
      col("_toks"),
      t => (pmod(graft.functions.Md5Hash60(t), lit(nBuckets.toLong)) + lit(1L)).cast("int"))
    val fold = graft.functions.ComputeOnce(
      aggregate(bkts, lit(0.0), (acc, b) => acc + term(b)))
    // _toks and _fold are pinned as real attributes (ComputeOnce inside
    // each keeps CollapseProject from inlining them): the tokenize and the
    // fold each run ONCE per row, downstream references are attribute reads
    withGrams(df, textCol, maxN, "_toks")
      .withColumn("_fold", fold)
      .select(
        col(idCol),
        size(col("_toks")).cast("long").as("n_grams"),
        floor(col("_fold") * lit(1e6)).cast("long").as("imp_e6"),
        when(size(col("_toks")) > 0,
          floor(col("_fold") / size(col("_toks")).cast("double") * lit(1e6)).cast("long"))
          .otherwise(lit(0L)).as("imp_mean_e6"))
  }

  /** Systematic importance RESAMPLING — the sampling step the DSIR paper
    * actually prescribes (Xie et al. NeurIPS'23 §3: sample the raw corpus
    * with probability proportional to importance weight), on top of
    * [[importanceWeights]]'s scores. [[dImportanceSelect]]'s top-K cut is
    * the budget view; THIS face is the distribution view — n draws with
    * multiplicity, heavy docs drawn more than once, the output mix
    * converging to the weight distribution.
    *
    * Systematic (low-variance) sampling in EXACT BIGINT arithmetic: lay
    * the docs on a number line in doc-id order, each covering an interval
    * of its weight; drop n equally-spaced sample points (spacing W/n,
    * deterministic offset = md5(seed) mod W) and count how many land in
    * each doc's interval:
    *   draws(doc) = ⌊(n·cum − o + W) / W⌋ − ⌊(n·(cum − w) − o + W) / W⌋
    * (the +W keeps both operands non-negative so truncating and floor
    * division agree across engines; it cancels in the difference). The
    * draw counts telescope to EXACTLY n — spec-pinned, oracle-replayable
    * with the same integer tree.
    *
    * Scale shape: the global running sum `cum` is a DISTRIBUTED prefix
    * sum, never a single-partition global window — one range shuffle on
    * the id, per-partition totals (≤ P rows) collected and re-entered as
    * a dense array literal of prefix offsets, then a per-partition
    * window. O(P) driver rows, two skinny shuffles, no corpus-sized
    * driver state.
    */
  /** The shared distributed-prefix machinery of [[importanceResample]] and
    * [[topFraction]] (VERDICT r16 #7 — one implementation, two orderings):
    * range-shuffle the skinny frame on `order`, pin the partition id,
    * `localCheckpoint` (the frame is consumed TWICE — the ≤P-row stats pass
    * below and the caller's window pass — so the upstream computation runs
    * once, not per action), then collect per-partition SUMs of `qtyCol`
    * (≤ P rows to the driver, the codebook stance) and return
    *   (ranged frame, offsets, minQty)
    * where `offsets(i) = Σ totals(<i)` (so `offsets(P)` is the grand total)
    * and `minQty` is the global minimum of `qtyCol` — computed in the SAME
    * cheap aggregation so callers can assert sign contracts without an
    * extra job (`Long.MaxValue` on an empty frame).
    *
    * The CALLER owns the returned checkpoint: release it via
    * [[graft.core.Checkpoints.release]] once the window pass has produced
    * (and checkpointed) its result. Partition-count invariance of the
    * derived ranks/draws is spec-pinned against THIS helper (CorpusOpsSpec).
    */
  /** `qtyCol = None` counts ROWS (the ordinal/rank mode — no per-row
    * quantity column is added to the checkpoint; the count comes from the
    * same aggregation for free, minQty is trivially 1). The stats pass and
    * any caller guard run inside a release-on-failure boundary: the eager
    * checkpoint must never strand its executor blocks when a contract
    * check throws (`Dataset.unpersist` is a no-op on checkpoint frames —
    * the Checkpoints scaladoc).
    */
  private[data] def distributedPrefix(
      df: DataFrame,
      order: Seq[Column],
      qtyCol: Option[String],
      nParts: Int
  ): (DataFrame, Array[Long], Long) = {
    val spark = df.sparkSession
    val p = if (nParts > 0) nParts else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, order: _*)
      .withColumn("_pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint()
    val stats = releaseOnFailure(ranged) {
      val (t, m) = qtyCol match {
        case Some(c) => (sum(col(c)).as("_t"), min(col(c)).as("_m"))
        case None => (count(lit(1)).as("_t"), lit(1L).as("_m"))
      }
      ranged.groupBy(col("_pid")).agg(t, m)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    }
    val totals = Array.fill(p)(0L)
    var minQty = Long.MaxValue
    stats.foreach { case (pid, t, m) =>
      totals(pid) = t
      if (m < minQty) minQty = m
    }
    (ranged, totals.scanLeft(0L)(_ + _), minQty)
  }

  /** Run `f`; on ANY throw, release the checkpoint-backed frames first and
    * rethrow — the error-path sibling of the happy-path tail release. A
    * contract guard (negative weight, flood, overflow) that fires AFTER an
    * eager `localCheckpoint` would otherwise strand corpus-sized executor
    * blocks in every catch-and-retry loop (code-review r17).
    */
  private[graft] def releaseOnFailure[T](frames: DataFrame*)(f: => T): T =
    try f
    catch {
      case e: Throwable =>
        // a release that itself throws (executor loss mid-unpersist) must
        // not REPLACE the original guard exception — the caller needs the
        // real failure; the cleanup failure rides along as suppressed
        // (ADVICE r17)
        frames.foreach { fr =>
          try graft.core.Checkpoints.release(fr)
          catch { case r: Throwable => e.addSuppressed(r) }
        }
        throw e
    }

  def importanceResample(
      weights: DataFrame,
      idCol: String,
      wCol: String,
      n: Long,
      seed: String,
      nParts: Int = 0
  ): DataFrame = {
    require(n > 0, s"importanceResample: n=$n draws must be positive")
    // the skinny (id, w, pid) frame: ~16 B/row of executor-local blocks;
    // construction is eager (the semdedup flood-guard precedent) and the
    // blocks release before return
    val (ranged, offsets, minW) = distributedPrefix(
      weights.select(col(idCol), col(wCol).cast("long").as("_w")),
      Seq(col(idCol)), Some("_w"), nParts)
    val p = offsets.length - 1
    releaseOnFailure(ranged) {
      // a negative weight makes its interval run backwards — n_draws can go
      // NEGATIVE and be silently dropped by the `> 0` filter, breaking the
      // exactly-n telescoping contract; fail loudly like the overflow guard
      // (ADVICE r16; checked in the same aggregation as the totals)
      require(minW >= 0,
        s"importanceResample: negative weight (min=$minW) — intervals would run " +
          "backwards and silently break the exactly-n draw contract; weights must " +
          "be non-negative (clamp or shift upstream)")
      val w0 = offsets(p)
      require(w0 > 0, "importanceResample: total weight is zero — nothing to draw from")
      // n·cum + W must stay in BIGINT on BOTH engines; fail loudly with the
      // remedy (scale the weights down — only ratios matter to the draw)
      require(w0 <= (Long.MaxValue - w0) / n,
        s"importanceResample: n=$n × totalWeight=$w0 overflows 64-bit — rescale the " +
          "weights (e.g. divide by 2^k; draw positions depend only on weight RATIOS)")
    }
    val w0 = offsets(p)
    val off = java.lang.Math.floorMod(graft.functions.Md5Hash60.hash(
      seed.getBytes("UTF-8")), w0)
    val offLit = lit(Array.tabulate(p)(i => offsets(i)))
    val cum =
      element_at(offLit, col("_pid") + 1) +
        sum(col("_w")).over(
          Window.partitionBy(col("_pid")).orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val out = releaseOnFailure(ranged) {
      ranged
        .withColumn("_cum", cum)
        // `div` (integral divide), NOT `/`: long / long is DOUBLE in Spark
        // and loses exactness past 2^53 — these operands go to n·W
        .withColumn("_hi", lit(n) * col("_cum") - lit(off) + lit(w0))
        .withColumn("_lo", lit(n) * (col("_cum") - col("_w")) - lit(off) + lit(w0))
        .withColumn("n_draws", expr(s"(_hi div ${w0}L) - (_lo div ${w0}L)"))
        .where(col("n_draws") > 0)
        .select(col(idCol), col("_w").as("weight"), col("n_draws"))
        // draw-sized result; hand the caller a frame that survives the release
        .localCheckpoint()
    }
    graft.core.Checkpoints.release(ranged)
    out
  }

  /** Exact global top-fraction cut — keep the best `keepPpm`/1e6 of the
    * corpus by a score column, with EXACT global ranks, no global sort
    * node and no driver-resident result: `orderBy(...).limit(k)` plans as
    * `TakeOrderedAndProject`, which materializes all k rows ON THE DRIVER
    * — fine for a top-100 report, fatal for "keep the best 10% of 10¹¹
    * docs" (the quality-filter cut of corpus curation). This face is the
    * distributed-rank primitive instead: range-partition on the ordering
    * key (skinny (id, score) rows), collect ≤P per-partition counts,
    * re-enter prefix offsets as a dense array literal, per-partition
    * `row_number` + offset = exact global rank (the
    * [[importanceResample]] prefix-sum pattern applied to ordinals).
    * Ties break by id — a total order, so ranks are partition-count
    * invariant (spec-pinned). Output `(id, score, rank)`, rank ≤
    * `⌊N·keepPpm/1e6⌋`.
    */
  def topFraction(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      keepPpm: Long,
      nParts: Int = 0
  ): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L,
      s"topFraction: keepPpm=$keepPpm outside [0, 1e6]")
    // ordinal mode (qtyCol = None): the prefix sum of row COUNTS needs no
    // per-row quantity column in the checkpoint — the stats aggregation
    // counts for free (code-review r17: a lit(1) column was +8 B on every
    // checkpointed corpus row purely to be summed)
    val (ranged, offsets, _) = distributedPrefix(
      df.select(col(idCol), col(scoreCol).cast("long").as("_s")),
      Seq(col("_s").desc, col(idCol).asc), None, nParts)
    val p = offsets.length - 1
    val n = offsets(p)
    val keepN = n * keepPpm / 1000000L
    val offLit = lit(Array.tabulate(p)(i => offsets(i)))
    val rank = element_at(offLit, col("_pid") + 1) +
      row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col("_s").desc, col(idCol).asc))
    val out = releaseOnFailure(ranged) {
      ranged
        .withColumn("rank", rank.cast("long"))
        .where(col("rank") <= keepN)
        .select(col(idCol), col("_s").as(scoreCol), col("rank"))
        .localCheckpoint()
    }
    graft.core.Checkpoints.release(ranged)
    out
  }

  /** Per-GROUP top-fraction cut — keep the best `keepPpm`/1e6 of every
    * group (source / domain / shard) by score: the per-domain quality
    * filter of corpus curation, where a global cut would let one
    * high-scoring domain crowd out the rest. One shuffle on the group
    * key; ranks and the per-group cut (`⌊n_g·keepPpm/1e6⌋`) are exact
    * BIGINT.
    *
    * Scale contract: within-group work is a per-group SORT, so this face
    * is for HIGH-CARDINALITY grouping (domains, sources, shards) where
    * groups are small relative to executors. For a low-cardinality /
    * skewed grouping (a handful of languages, one giant group), run
    * [[topFraction]] once per group instead — its prefix-sum rank
    * parallelizes INSIDE the group.
    */
  def topFractionByGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String,
      keepPpm: Long
  ): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L,
      s"topFractionByGroup: keepPpm=$keepPpm outside [0, 1e6]")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_s").desc, col(idCol).asc)
    val cw = Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(scoreCol).cast("long").as("_s"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(cw))
      .where(col("rank") <= expr(s"(_n * ${keepPpm}L) div 1000000L"))
      .select(col(idCol), col(groupCol), col("_s").as(scoreCol), col("rank"))
  }

  /** Per-source corpus mixture PLAN under a token budget — the
    * [[graft.data.Similarity.imiProbePlan]] control-loop pattern applied
    * to domain mixing (the DoReMi/DSIR deployment step: a target domain
    * mix exists, the crawl does not match it, and the sampler needs
    * per-source rates that are honest about shortfalls). For each source:
    * available tokens, wanted tokens (`budget · share`, exact ppm
    * arithmetic), the md5-ticket keep-rate that realizes
    * `min(want, avail)`, and a loud `fits` verdict — an under-supplied
    * source caps at rate 1 and flags `fits = false` instead of silently
    * under-delivering the mix. Everything stays in BIGINT; the output is
    * |sources| rows (driver-trivial, broadcastable to the apply join).
    *
    * One aggregation pass over the corpus — at 100 TB the plan costs one
    * map-side-combinable groupBy on the source key.
    */
  def corpusMixPlan(
      df: DataFrame,
      srcCol: String,
      tokens: Column,
      targetSharesPpm: Map[String, Long],
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, s"corpusMixPlan: budgetTokens=$budgetTokens must be positive")
    val shareSum = targetSharesPpm.values.sum
    require(targetSharesPpm.values.forall(_ >= 0) && shareSum <= 1000000L,
      s"corpusMixPlan: shares must be non-negative ppm summing ≤ 1e6 (got $shareSum)")
    val sorted = targetSharesPpm.toSeq.sortBy(_._1)
    val shareMap = map_from_arrays(
      lit(sorted.map(_._1).toArray), lit(sorted.map(_._2).toArray))
    val share = coalesce(element_at(shareMap, col("source")), lit(0L))
    val avail = df.groupBy(col(srcCol).as("source"))
      .agg(sum(tokens.cast("long")).as("avail_tokens"))
    // a PLANNED source entirely absent from the corpus must still emit a
    // row: groupBy only yields sources present in df, so a want>0/avail=0
    // shortfall would otherwise vanish silently and applyMixPlan would
    // under-deliver the mix with no flag (ADVICE r16). The full-outer join
    // unions the target key set in (|sources| rows, driver-trivial);
    // corpus-only sources keep their existing share-0 rows.
    val spark = df.sparkSession
    val plannedKeys = spark.createDataset(sorted.map(_._1))(
      org.apache.spark.sql.Encoders.STRING).toDF("source")
    avail.join(plannedKeys, Seq("source"), "full_outer")
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      // `div`, not `/` — long / long is DOUBLE in Spark (exactness)
      .withColumn("_want_num", lit(budgetTokens) * share)
      .withColumn("want_tokens", expr("_want_num div 1000000L"))
      .withColumn(
        "plan_tokens", least(col("want_tokens"), col("avail_tokens")))
      .withColumn(
        "rate_ppm",
        when(col("avail_tokens") > 0,
          least(lit(1000000L),
            expr("(1000000L * want_tokens) div avail_tokens")))
          .otherwise(lit(0L)))
      .withColumn("fits", col("avail_tokens") >= col("want_tokens"))
      .drop("_want_num")
  }

  /** Apply a [[corpusMixPlan]]: deterministic per-source md5-ticket
    * sampling at the planned rate (the [[stratifiedSample]] family —
    * survival is a pure function of (source, id), reproducible across
    * runs and partitionings, stable under corpus growth). The plan frame
    * is |sources| rows and broadcasts; the corpus is touched once.
    */
  def applyMixPlan(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      plan: DataFrame
  ): DataFrame = {
    val ticket = pmod(
      graft.functions.Md5Hash60(
        concat(col(srcCol), lit("|"), col(idCol).cast("string"))),
      lit(1000000L))
    df.join(
        broadcast(plan.select(col("source").as("_mix_src"), col("rate_ppm"))),
        col(srcCol) === col("_mix_src"))
      .where(ticket < col("rate_ppm"))
      .select(col(idCol), col(srcCol).as("source"))
  }
}
