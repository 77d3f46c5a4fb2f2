package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, document fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs) — at 100 TB
  * these run fused with the parquet scan, one pass, zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** A BPE-ish subword proxy: word tokens plus punctuation-split fragments —
    * counts units a byte-pair tokenizer would not merge across.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[\\s\\p{Punct}]+"), t => t =!= ""))

  /** Word n-grams of an ALREADY-MATERIALIZED token-array column (space
    * joined); docs shorter than n yield an empty array. Callers must pin
    * the token array behind [[graft.functions.ComputeOnce]] (or a real
    * attribute) BEFORE passing it here — referencing a raw tokenizer
    * expression makes CollapseProject inline the regex split into the
    * per-element lambda, an O(words²) re-split per doc.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))
    ).otherwise(array().cast("array<string>"))

  /** Common-word profiles for the n-gram language-ID heuristic (public
    * stopword lists, top function words per language).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un")
  )

  /** Hit count of one profile in the token array. */
  def profileScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Predicted language: argmax profile score, ties resolved by profile order
    * (alphabetical), 'und' when every score is zero.
    */
  def langId(toks: Column): Column = {
    var bestLang: Column = lit(langProfiles.head._1)
    var bestScore: Column = profileScore(toks, langProfiles.head._2)
    langProfiles.tail.foreach { case (l, ws) =>
      val s = profileScore(toks, ws)
      bestLang = when(s > bestScore, lit(l)).otherwise(bestLang)
      bestScore = when(s > bestScore, s).otherwise(bestScore)
    }
    when(bestScore === 0, lit("und")).otherwise(bestLang)
  }

  /** PII patterns for corpus scrubbing: email, IPv4, long digit runs
    * (phone/account-shaped). Deliberately a conservative regex subset —
    * ASCII classes, `\b` boundaries, no backreferences/lookaround — that
    * behaves identically under Java regex (Spark) and RE2 (DuckDB oracle).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("digits", "\\b[0-9][0-9 -]{6,}[0-9]\\b", "<NUM>")
  )

  /** Repetition profile (Gopher-style quality signals) as EXACT counts —
    * callers derive fractions (duplicate-word ratio, top-word fraction,
    * duplicate-2-gram ratio); emitting counts keeps the frame
    * integer-exact for replay/oracle comparison.
    *
    * Scale shape: EVERY metric — including the top-word frequency — is a
    * per-row expression fused with the scan: zero shuffles, zero joins.
    * The top-word count is the longest run in the SORTED token array
    * (O(len·log len) per row), replacing an earlier explode →
    * (doc, word) aggregate → join-back that shuffled every word of the
    * corpus twice.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ComputeOnce: stop CollapseProject from inlining the tokenizer into
    // the gram/sort lambdas (a regex re-split per element)
    val toks = col("_toks")
    // longest equal-run in the sorted array == max word multiplicity
    val topWord = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.withColumn("_toks", graft.functions.ComputeOnce(tokens(col(textCol))))
      .select(
        col(idCol),
        size(toks).cast("long").as("n_words"),
        size(array_distinct(toks)).cast("long").as("n_distinct_words"),
        when(size(toks) >= 2, size(toks) - 1).otherwise(0)
          .cast("long").as("n_2grams"),
        size(array_distinct(ngrams(toks, 2))).cast("long").as("n_distinct_2grams"),
        topWord.as("top_word_n"))
  }

  /** Bigram commonness — the integer-exact fluency proxy of an LM filter
    * (CCNet-style "score docs by a corpus LM"): every doc bigram is scored
    * by its corpus-wide frequency; a doc whose bigrams are corpus-rare
    * (low freq_min / low freq_sum per gram) reads as gibberish or heavy
    * boilerplate-noise. Counts stay BIGINT end-to-end — no log-prob floats,
    * so the score replays exactly.
    *
    * Scale shape: gram counting is a two-stage aggregate with map-side
    * combine; the score join co-partitions (gram → count) with the doc
    * grams. At 100 TB train the count table on a SAMPLE and broadcast it —
    * the operator takes no position on that: callers pass the corpus they
    * want the model trained on via `train`.
    */
  def bigramCommonness(
      df: DataFrame,
      idCol: String,
      textCol: String,
      train: Option[DataFrame] = None
  ): DataFrame = {
    // explode_OUTER keeps short/empty docs as a single null-gram row, so
    // they score zeros without a third corpus scan + join-back
    def grams(src: DataFrame): DataFrame =
      src
        .withColumn("_toks", graft.functions.ComputeOnce(tokens(col(textCol))))
        .select(col(idCol), explode_outer(ngrams(col("_toks"), 2)).as("_g"))
    val counts = grams(train.getOrElse(df))
      .filter(col("_g").isNotNull)
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_c"))
    grams(df)
      .join(counts, Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("_g")).as("n_bigrams"), // count() skips the null-gram row
        sum(when(col("_g").isNotNull, coalesce(col("_c"), lit(0L))).otherwise(lit(0L)))
          .as("freq_sum"),
        min(when(col("_g").isNotNull, coalesce(col("_c"), lit(0L))).otherwise(lit(0L)))
          .as("freq_min"))
  }

  /** Scrub PII: per-pattern match counts (each pattern counted independently
    * on the raw text) plus the redacted text (replacements applied
    * sequentially in [[piiPatterns]] order, so an email is rewritten to
    * `<EMAIL>` before the IP pass sees the text). Scale shape: pure per-row
    * regex, scan-fused, zero shuffle.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).as(s"n_$name")
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    df.select(col(idCol) +: counts :+ redacted.as("redacted"): _*)
  }

  /** Quality metrics frame: counts and single-division ratios (deterministic
    * IEEE ops, oracle-identical expression shape).
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nChar = length(t)
    val punct = nChar - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stop = profileScore(toks, langProfiles.flatMap(_._2).distinct)
    val sumTokLen = aggregate(toks, lit(0), (acc, x) => acc + length(x))
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      nChar.as("n_chars_measured"),
      subwordCount(t).as("n_subwords"),
      (sumTokLen.cast("double") / nTok).as("avg_token_len"),
      (punct.cast("double") / nChar).as("punct_ratio"),
      (stop.cast("double") / nTok).as("stopword_ratio")
    )
  }

  /** Hashed linear quality classifier — the fastText-style model-scoring
    * PLUMBING a curation pipeline puts behind a learned quality filter:
    * tokens hash into `dims` feature buckets, each bucket carries a model
    * weight, the document score is the mean bucket-weight of its tokens
    * (length-normalized by n+1 so empty docs score 0, not NaN). Here the
    * weights are deterministic md5-derived placeholders from the same
    * cross-engine hash family as [[Similarity.hyperplanes]] — swap
    * [[modelWeights]] for trained coefficients and nothing else changes.
    *
    * Scale shape: scan-fused — the weight table is a broadcast-as-literal
    * array (dims doubles), the per-token bucket lookup and the
    * left-to-right sum fold run inside the row projection; zero shuffles,
    * zero UDFs. Scores ship as floor(score·1e6) longs; the fold order is
    * pinned so the oracle hash-matches bit-for-bit.
    */
  def modelWeights(dims: Int): Seq[Double] =
    (0 until dims).map { j =>
      val h = graft.functions.Md5Hash60.hash(s"qw_$j".getBytes("UTF-8"))
      (h % 2001 - 1000) / 1000.0
    }

  def qualityModelScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 64
  ): DataFrame = {
    val weights = modelWeights(dims)
    val wArr = array(weights.map(lit): _*)
    val toks = tokens(lower(col(textCol)))
    // md5-60 is non-negative, so % dims needs no pmod; +1 for 1-based arrays
    val contrib = transform(
      toks,
      t => element_at(wArr, (Hashing.hash60(t) % dims).cast("int") + 1))
    val raw = aggregate(contrib, lit(0.0), (a, x) => a + x)
    df.select(
      col(idCol),
      size(toks).as("n_tokens"),
      floor(raw / (size(toks) + 1) * 1e6).cast("long").as("score_e6"),
      (raw > 0.0).as("keep_model"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, non-alnum
    * collapsed) plus its 60-bit long form for compact joins.
    */
  /** BM25 retrieval scoring of the corpus against a fixed term set — the
    * relevance-ranking face of corpus curation (pull the documents most
    * "about" a topic into a training mix, or rank boilerplate away).
    *
    * Uses the RATIONAL idf `(N - df + 0.5) / (df + 0.5)` — the argument of
    * BM25's log, without the log. The ranking changes (log compresses
    * high-idf terms), but every arithmetic op is IEEE +,*,/ — correctly
    * rounded and therefore BIT-IDENTICAL across engines, which `ln` is
    * not — so the oracle can hash-match the scores exactly. Callers who
    * need classic BM25 monotonicity per term get it anyway: the rational
    * idf is a monotone transform of the log idf for a SINGLE term; only
    * multi-term mixes weigh rare terms harder.
    *
    * Scale shape: two corpus passes, no per-doc shuffle. Pass 1 aggregates
    * (N, total doclen, per-term df) into ONE row that broadcast-cross-joins
    * back; pass 2 computes every per-(doc, term) tf from the pinned token
    * array in the scan, folds term scores in fixed alphabetical order
    * (float addition is not associative — a stable fold order is what
    * makes the result reproducible run to run), and TakeOrderedAndProject
    * keeps the global top-k as per-partition heaps + one driver merge.
    * Scores ship as `floor(score * 1e6)` longs.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    require(topK > 0, s"topK must be positive, got $topK")
    val terms = queryTerms.sorted
    val toked = df
      .withColumn("_t", graft.functions.ComputeOnce(tokens(col(textCol))))
      .withColumn("_dl", size(col("_t")))
    val statAggs =
      count(lit(1)).as("_bm_n") +:
        sum(col("_dl").cast("long")).as("_bm_sumdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("_t"), t), 1L).otherwise(0L)).as(s"_bm_df_$i")
        }
    val stats = toked.agg(statAggs.head, statAggs.tail: _*)
    val n = col("_bm_n").cast("double")
    val avgdl = col("_bm_sumdl").cast("double") / n
    def termScore(t: String, i: Int): Column = {
      val tf = size(filter(col("_t"), x => x === lit(t))).cast("double")
      val dfT = col(s"_bm_df_$i").cast("double")
      val idf = (n - dfT + lit(0.5)) / (dfT + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / avgdl))
    }
    val total = terms.zipWithIndex.map((termScore _).tupled).reduce(_ + _)
    toked
      .crossJoin(broadcast(stats))
      .select(col(idCol), floor(total * lit(1e6)).as("bm25_e6"))
      .orderBy(col("bm25_e6").desc, col(idCol))
      .limit(topK)
  }

  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
    df.select(
      col(idCol),
      md5(norm).as("fp_md5"),
      Hashing.hash60(norm).as("fp60")
    )
  }
}
