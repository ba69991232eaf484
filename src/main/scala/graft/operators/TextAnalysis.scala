package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, document fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they run at scan speed and are
  * exactly reproducible by the SQL oracle.
  */
object TextAnalysis {

  /** Whitespace token count; 0 for blank text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: words plus extra units for long words
    * (a word of length L costs ceil(L/4) tokens) — the standard ~4 chars
    * per token heuristic, computed distributively over the token array.
    */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L)).otherwise(
      aggregate(split(trim(text), "\\s+"), lit(0L),
        (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")))

  /** Quality features: char/token counts, mean token length, punctuation
    * ratio, uppercase ratio, stopword ratio (tiny English stopword list).
    * These are the length/punct/stopword heuristics a pretraining filter
    * uses; thresholds stay in the caller.
    */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val stripped = regexp_replace(t, "\\s+", "")
    val punct = length(regexp_replace(stripped, "[\\p{L}\\p{N}]", ""))
    val upper = length(regexp_replace(stripped, "[^A-Z]", ""))
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "that", "for", "on", "with", "as")
    val stopHits = aggregate(split(lower(trim(t)), "\\s+"), lit(0L),
      (acc, w) => acc + when(w.isin(stopwords.map(lit(_)): _*), 1L).otherwise(0L))
    df.withColumn("n_tokens", toks)
      .withColumn("n_chars_stripped", length(stripped))
      .withColumn("mean_token_len",
        when(toks > 0, length(stripped).cast("double") / toks))
      .withColumn("punct_ratio",
        when(length(stripped) > 0, punct.cast("double") / length(stripped)))
      .withColumn("upper_ratio",
        when(length(stripped) > 0, upper.cast("double") / length(stripped)))
      .withColumn("stopword_ratio",
        when(toks > 0, stopHits.cast("double") / toks))
  }

  /** Composite quality score in [0,1]: blend of length band, stopword
    * presence and low punctuation — a deterministic stand-in for a model
    * scorer, with the same plan shape.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    withQualityFeatures(df, textCol).withColumn("quality_score",
      round(
        (when(col("n_tokens").between(10, 10000), 0.4).otherwise(0.0)
          + when(col("stopword_ratio") > 0.01, 0.3).otherwise(0.0)
          + when(col("punct_ratio") < 0.2, 0.3).otherwise(0.0)), 6))

  /** N-gram-frequency language ID. Scores each candidate language by the
    * fraction of tokens hitting its marker list (top function words);
    * prediction = argmax, ties to the lexicographically first language.
    * Heuristic but deterministic and fully distributed — and exactly what
    * fastText-less pipelines ship as a first-pass filter.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "une", "dans", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val scored = langMarkers.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, markers), i) =>
        val hits = aggregate(toks, lit(0L),
          (acc, w) => acc + when(w.isin(markers.map(lit(_)): _*), 1L).otherwise(0L))
        // struct comparison is lexicographic: max score wins; on ties the
        // greatest -index = smallest index = alphabetically-first language.
        struct((hits.cast("double") / size(toks)).as("score"),
          lit(-i).as("neg_idx"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    df.withColumn("lang_pred",
        when(size(toks) > 0 && best.getField("score") > 0, best.getField("lang"))
          .otherwise(lit("und")))
      .withColumn("lang_score", round(coalesce(best.getField("score"), lit(0.0)), 6))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * engine-portable (same digest in any engine), used for exact dedup
    * and change detection.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash over tokens (base-31 mod 1e9+7) — an
    * order-sensitive fingerprint that distinguishes permuted documents,
    * computed as a left fold over the token array. The modulus keeps every
    * intermediate < 2^35, so the arithmetic is overflow-free in any
    * 64-bit engine and the oracle can reproduce it exactly.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => pmod(acc * 31 + pmod(Dedup.md5Hash56(w), lit(1000000007L)),
        lit(1000000007L)))

  /** Gopher-style within-document repetition metrics (Rae et al. 2021
    * §A1.1: repetitious documents are low-quality training data):
    * duplicate-word fraction, duplicate-bigram fraction, and the
    * fraction of the document taken by its single most frequent word.
    * Pure array math over the token array — the top-word scan is
    * O(distinct·n) per row, fine for document-sized arrays and still a
    * single codegen'd projection at corpus scale. Thresholds stay with
    * the caller (the catalog query flags >30% dup bigrams or >20%
    * top-word share).
    */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val n = size(words)
    val bigrams = zip_with(
      slice(words, lit(1), greatest(n - 1, lit(0))),
      slice(words, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val topWordCount = array_max(transform(array_distinct(words),
      w => size(filter(words, x => x === w))))
    df.withColumn("n_words", n)
      .withColumn("dup_word_frac",
        lit(1.0) - size(array_distinct(words)).cast("double") / n)
      .withColumn("dup_bigram_frac",
        when(n > 1, lit(1.0) -
          size(array_distinct(bigrams)).cast("double") / (n - 1))
          .otherwise(lit(0.0)))
      .withColumn("top_word_frac", topWordCount.cast("double") / n)
  }

  /** PII redaction patterns — deliberately RE2-compatible (no lookarounds,
    * no backreferences) so the DuckDB oracle and any engine's regex
    * runtime accept them verbatim: emails, international-format phone
    * numbers, and 0x-hex chain addresses.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\+[0-9][0-9 -]{7,}[0-9]" -> "[PHONE]",
    "0x[0-9a-fA-F]{40}" -> "[ADDR]")

  /** PII scrubbing: mask emails / phone numbers / chain addresses with
    * typed placeholder tokens and count the redactions — the masking pass
    * a training pipeline runs before anything leaves the raw zone. Pure
    * regexp projection (codegen'd, scan-speed); order matters (emails
    * first, so a phone regex can never eat part of a mangled address).
    */
  def redactPii(df: DataFrame, textCol: String,
      outCol: String = "text_redacted"): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (pattern, token)) => regexp_replace(c, pattern, token)
    }
    val nRedactions = piiPatterns.map { case (pattern, _) =>
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
    }.reduce(_ + _)
    df.withColumn(outCol, redacted)
      .withColumn("n_redactions", nRedactions.cast("long"))
  }

  /** Benchmark-contamination check: count, per candidate document, the
    * DISTINCT word n-grams it shares with a benchmark/eval corpus, and
    * flag docs at or above `minOverlap` (the n-gram-overlap decontamination
    * step of pretraining pipelines — e.g. GPT-3 appendix C / PaLM §7.1
    * style 8-13-gram collision checks, here parameterized).
    *
    * Scale shape: both sides explode to DISTINCT (id, shingle) rows
    * (Dedup.shingles), the benchmark side collapses to a distinct shingle
    * set, and the overlap is an equi-join on the shingle string — a
    * hash-partitioned join on n-gram keys, never an all-pairs comparison.
    * At corpus scale the benchmark side is tiny and broadcasts.
    */
  def contaminationCheck(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int, minOverlap: Int): DataFrame = {
    val candShingles = Dedup.shingles(candidates, textCol, idCol, n)
    val benchShingles = Dedup.shingles(benchmark, textCol, idCol, n)
      .select(col("shingle")).distinct()
    candShingles.join(benchShingles, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Fuzzy self-match: all unordered pairs within `maxDist` edit
    * distance, found with LENGTH BLOCKING — levenshtein(a,b) ≤ k implies
    * |len(a)−len(b)| ≤ k, so the probe side explodes the 2k+1 candidate
    * lengths and the pair space collapses to an equi-join on length
    * (hash-shuffleable at any scale; never a cross join). Each true pair
    * is emitted exactly once: it matches on the single key equal to the
    * build side's length, and `id_a < id_b` fixes the orientation.
    * `levenshtein` is a codegen'd built-in; the O(|s|²) DP runs only on
    * length-blocked candidates. For corpus-scale strings (documents, not
    * names) block on q-gram signatures instead — same join shape, tighter
    * candidate set.
    */
  /** Overlapping token-window chunking — the context-window prep step of
    * an LLM training pipeline: each document becomes chunks of up to
    * `chunkLen` tokens starting every `stride` tokens, so consecutive
    * chunks overlap by `chunkLen - stride` tokens and the document tail is
    * always covered. Start offsets are `0, stride, 2·stride, …` up to the
    * last offset that contributes tokens the previous chunk didn't already
    * cover (`n - chunkLen + stride - 1`), so no chunk is a strict suffix
    * of its predecessor. Pure `sequence`/`explode`/`slice` column algebra:
    * narrow per-row expansion, no shuffle, no UDF — chunking 100 TB is
    * scan-speed map work, and output rows inherit the input's
    * partitioning. Blank documents produce no chunks.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkLen >= stride,
      s"need 0 < stride <= chunkLen, got stride=$stride chunkLen=$chunkLen")
    // Squeeze runs of whitespace to single spaces BEFORE trimming: trim
    // only strips ' ' (not \n\t), so a whitespace-only doc would otherwise
    // survive the blank filter and chunk into empty tokens.
    val cleaned = trim(regexp_replace(col(textCol), "\\s+", " "))
    val toks = split(cleaned, " ")
    df.where(length(cleaned) > 0)
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .withColumn("__start", explode(sequence(lit(0),
        greatest(col("__n") - chunkLen + stride - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        (col("__start") / stride).cast("int").as("chunk_idx"),
        least(col("__n") - col("__start"), lit(chunkLen)).as("chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkLen)), " ")
          .as("chunk_text"))
  }

  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s")))
    val probe = base
      .withColumn("__len_key",
        explode(sequence(col("__len") - maxDist, col("__len") + maxDist)))
      .select(col("__id").as("id_a"), col("__s").as("s_a"), col("__len_key"))
    val build = base.select(col("__id").as("id_b"), col("__s").as("s_b"),
      col("__len").as("__len_key"))
    probe.join(build, "__len_key")
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Tokens with 1-based positions for span-level operators. One narrow
    * posexplode per doc; blank docs are excluded so position arithmetic
    * never sees an empty-token row.
    */
  private def positionedTokens(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val base = df.where(trim(col(textCol)) =!= "")
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("tk"))
    val toks = base.select(col(idCol),
        posexplode(col("tk")).as(Seq("__p0", "tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("p"), col("tok"))
    (base, toks)
  }

  /** Intra-document repeated-span removal (the within-doc variant of
    * training-data dedup a la "Deduplicating Training Data Makes LMs
    * Better"): every k-gram occurrence after its first in the SAME
    * document marks its k token positions for removal; surviving tokens
    * are re-joined in order. Semantics are position-exact and engine-
    * reproducible: repeat starts come from a min-position-per-gram
    * window, covered positions from a bounded `sequence` explode (k rows
    * per repeat start — never a range join), and the scrub is one
    * anti-join on (doc, position). All shuffles key on doc_id, so a
    * 100 TB corpus scrubs as embarrassingly-parallel per-doc work.
    * Returns (idCol, n_tokens, n_removed, cleaned_md5) — the md5 stands
    * in for the rebuilt text so the result row stays narrow; callers
    * wanting the text itself use [[repeatedSpanScrubText]], the same
    * aggregate without the hash.
    */
  def repeatedSpanScrub(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val (base, kept) = scrubKeptTokens(df, idCol, textCol, k)
    scrubSummary(base, kept, idCol)
  }

  /** [[repeatedSpanScrub]] returning the rebuilt text itself (wide rows;
    * prefer the hashed form for audits): (idCol, cleaned_text). The
    * reconstruction lowercases and single-space-joins, i.e. the
    * tokenization's normalization — document-level whitespace/case is
    * not preserved through a token-level scrub.
    */
  def repeatedSpanScrubText(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val (base, kept) = scrubKeptTokens(df, idCol, textCol, k)
    val agg = kept.groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          e => e.getField("tok"))).as("cleaned_text"))
    base.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Shared core of the span scrub: (base with token arrays, surviving
    * positioned tokens after the covered-position anti-join).
    */
  private def scrubKeptTokens(df: DataFrame, idCol: String,
      textCol: String, k: Int): (DataFrame, DataFrame) = {
    val (base, toks) = positionedTokens(df, idCol, textCol)
    val grams = docGrams(toks, idCol, k)
    val covered = grams
      .withColumn("__first",
        min(col("p")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol), col("g"))))
      .where(col("p") > col("__first"))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + lit(k - 1))).as("p"))
      .distinct()
    (base, toks.join(covered, Seq(idCol, "p"), "left_anti"))
  }

  /** Every k-gram start position per doc: (idCol, p, g). One windowed
    * lead chain keyed on the doc — per-doc parallel at any corpus size.
    */
  private def docGrams(toks: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"span length must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val gram = concat_ws(" ",
      col("tok") +: (1 until k).map(i => lead(col("tok"), i).over(w)): _*)
    toks
      .withColumn("__last", lead(col("tok"), k - 1).over(w))
      .withColumn("g", gram)
      .where(col("__last").isNotNull)
      .select(col(idCol), col("p"), col("g"))
  }

  /** Narrow per-doc scrub summary: (idCol, n_tokens, n_removed,
    * cleaned_md5) from the base token arrays and the surviving
    * positioned tokens. Fully-scrubbed docs hash the empty string.
    */
  private def scrubSummary(base: DataFrame, kept: DataFrame,
      idCol: String): DataFrame = {
    val agg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            e => e.getField("tok")))).as("cleaned_md5"))
    base.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
  }

  /** CROSS-document duplicated-span scrub — the ExactSubstr pass of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., arXiv:2107.06499), restricted to spans shared ACROSS documents
    * (the within-doc repeats are [[repeatedSpanScrub]]'s jurisdiction,
    * so the two passes compose without double jeopardy): a k-token
    * window whose text occurs in two or more distinct documents keeps
    * ALL its occurrences in the lowest doc id (the canonical copy stays
    * readable) and marks every occurrence in any higher doc id for
    * removal; surviving tokens re-join in order.
    *
    * Plan shape: the per-gram survivor frame is one map-combinable
    * aggregate over (gram → min doc, distinct-doc count) — grouped on
    * the gram, the same key the occurrence join then reuses, so AQE sees
    * one exchange reused twice. Covered positions come from a bounded
    * sequence-explode (k rows per scrubbed occurrence, never a range
    * join) and the scrub is one anti-join on (doc, position). At crawl
    * scale the gram strings themselves never need to shuffle twice:
    * substituting [[Dedup.md5Hash56]] of the gram for the join key cuts
    * the exchange to 8 bytes/row with identical semantics (md5 is
    * engine-portable, so the oracle contract survives the swap).
    * Returns (idCol, n_tokens, n_removed, cleaned_md5).
    */
  def crossDocSpanScrub(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val (base, kept) = crossDocKeptTokens(df, idCol, textCol, k)
    scrubSummary(base, kept, idCol)
  }

  /** [[crossDocSpanScrub]] returning the rebuilt text itself:
    * (idCol, cleaned_text) — the form the next corpus pass consumes
    * (t62 chains segment dedup over it). Same normalization caveat as
    * [[repeatedSpanScrubText]]: lowercase, single-space joined.
    * Fully-scrubbed (and blank) docs return empty text.
    */
  def crossDocSpanScrubText(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val (base, kept) = crossDocKeptTokens(df, idCol, textCol, k)
    val agg = kept.groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          e => e.getField("tok"))).as("cleaned_text"))
    base.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  private def crossDocKeptTokens(df: DataFrame, idCol: String,
      textCol: String, k: Int): (DataFrame, DataFrame) = {
    val (base, toks) = positionedTokens(df, idCol, textCol)
    val grams = docGrams(toks, idCol, k).localCheckpoint(true)
    val survivors = grams.groupBy(col("g"))
      .agg(min(col(idCol)).as("__first_doc"),
        countDistinct(col(idCol)).as("__n_docs"))
      .where(col("__n_docs") >= 2)
      .select(col("g"), col("__first_doc"))
    val covered = grams.join(survivors, Seq("g"))
      .where(col(idCol) > col("__first_doc"))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + lit(k - 1))).as("p"))
      .distinct()
    (base, toks.join(covered, Seq(idCol, "p"), "left_anti"))
  }

  /** Bigram language-model scoring — the CCNet-style LM-quality filter
    * (Wenzek et al., arXiv:1911.00359 use KenLM perplexity; this is the
    * engine-native add-one-smoothed bigram form): train conditional
    * bigram counts on the whole corpus, then score every document by
    * the mean negative log-likelihood of its bigrams,
    * nll = avg(−ln((c(prev,tok)+1)/(c(prev)+V))) — perplexity is
    * exp(nll), monotone, so the filter thresholds nll directly.
    * Complements [[importanceLogRatio]]: DSIR ranks docs by
    * target-vs-pool fit, this ranks them by absolute fluency under the
    * corpus's own statistics (the "gibberish/boilerplate" axis).
    *
    * Deterministic end-to-end (integer counts, one float expression per
    * bigram), so fully hash-oracled. Plan: one (prev, tok) count
    * aggregate whose exchange the scoring join REUSES (same key), one
    * broadcast unigram join, one scalar vocab aggregate, one per-doc
    * aggregate — four shuffles total, all map-combinable. At crawl
    * scale the bigram LM frame is vocab²-bounded, not corpus-bounded;
    * a deployment that can't hold it substitutes
    * [[graft.expressions]]-hashed buckets for tokens exactly as
    * [[importanceLogRatioHashed]] does for the unigram LM.
    * Returns (idCol, n_bigrams, nll); docs with < 2 tokens emit no row.
    */
  def bigramLmScore(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, toks) = positionedTokens(df, idCol, textCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val bi = toks
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col(idCol), col("prev"), col("tok"))
      .localCheckpoint(true)
    val pairCounts = bi.groupBy(col("prev"), col("tok"))
      .agg(count(lit(1)).as("c_pair"))
    val uniCounts = toks.groupBy(col("tok").as("prev"))
      .agg(count(lit(1)).as("c_uni"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))
    bi.join(pairCounts, Seq("prev", "tok"))
      .join(uniCounts, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("c_pair") + lit(1.0)) /
          (col("c_uni") + col("v")))) + lit(1e-9), 6).as("nll"))
  }

  /** Segment-level corpus dedup with document reconstruction — the
    * C4/FineWeb "duplicated line removal" pass (Raffel et al.,
    * arXiv:1910.10683 §2.2; Penedo et al., arXiv:2406.17557), adapted to
    * aligned `segTokens`-token blocks because the fixture corpus has no
    * newlines: each document splits into consecutive blocks (last block
    * ragged), a block's text is deduplicated GLOBALLY — only its first
    * occurrence in (doc id, block index) order survives, including
    * repeats inside one document — and every document is rebuilt from
    * its surviving blocks in order.
    *
    * Plan shape: segmentation is one per-doc aggregate (groupBy doc ×
    * block index, sort-free — position order is restored inside the
    * collect via array_sort); survivorship is one map-combinable
    * min(struct(doc, idx)) aggregate keyed on the segment, re-joined on
    * the same key so AQE reuses the exchange; reconstruction is one
    * per-doc aggregate. Nothing is a window over the corpus, so no
    * single-reducer stage exists at any scale. Hyper-frequent
    * boilerplate segments make the survivor GROUP key hot, but min() is
    * a partial aggregate — the combiner absorbs the skew map-side; the
    * re-join fans the hot key back out row-per-occurrence, which AQE
    * skew-split handles (it's a plain equi-join). At crawl scale the
    * join key should be [[Dedup.md5Hash56]] of the block (8 bytes vs the
    * block text) — engine-portable, so the oracle contract survives.
    * Returns (idCol, n_segments, n_removed, cleaned_md5).
    */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    val segs = docSegments(df, idCol, textCol, segTokens)
    val firstOcc = segs.groupBy(col("seg"))
      .agg(min(struct(col(idCol), col("sidx"))).as("__f"))
    val kept = segs.join(firstOcc, Seq("seg"))
      .where(col(idCol) === col("__f").getField(idCol) &&
        col("sidx") === col("__f").getField("sidx"))
      .select(col(idCol), col("sidx"), col("seg"))
    segmentSummary(segs, kept, idCol)
  }

  /** Boilerplate-segment filter — the OTHER half of C4's line policy
    * (arXiv:1910.10683 §2.2 removes boilerplate lines seen across many
    * pages outright): aligned `segTokens`-token blocks whose text occurs
    * in at least `minDocFreq` DISTINCT documents are removed from EVERY
    * document, first occurrence included (contrast [[segmentDedup]],
    * which keeps the first copy — dedup preserves one reading;
    * boilerplate removal preserves none). One map-combinable
    * distinct-doc-count aggregate keyed on the segment, re-joined on the
    * same key (AQE reuses the exchange); rebuild is per-doc. Returns
    * (idCol, n_segments, n_removed, cleaned_md5).
    */
  def boilerplateSegmentFilter(df: DataFrame, idCol: String,
      textCol: String, segTokens: Int, minDocFreq: Int): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val segs = docSegments(df, idCol, textCol, segTokens)
    val hot = segs.groupBy(col("seg"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select(col("seg"))
    val kept = segs.join(hot, Seq("seg"), "left_anti")
      .select(col(idCol), col("sidx"), col("seg"))
    segmentSummary(segs, kept, idCol)
  }

  /** Aligned `segTokens`-token blocks per doc: (idCol, sidx, seg), last
    * block ragged; one per-doc aggregate, position order restored inside
    * the collect. Eagerly materialized — every consumer reads it at
    * least twice (frequency pass + scrub pass).
    */
  private def docSegments(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    require(segTokens >= 1, s"segment size must be >= 1, got $segTokens")
    val (_, toks) = positionedTokens(df, idCol, textCol)
    toks
      .withColumn("sidx", ((col("p") - 1) / segTokens).cast("long"))
      .groupBy(col(idCol), col("sidx"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          e => e.getField("tok"))).as("seg"))
      .localCheckpoint(true)
  }

  /** Per-doc scrub summary over segment frames: (idCol, n_segments,
    * n_removed, cleaned_md5); fully-removed docs hash the empty string.
    */
  private def segmentSummary(segs: DataFrame, kept: DataFrame,
      idCol: String): DataFrame = {
    val counts = segs.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("sidx"), col("seg")))),
            e => e.getField("seg")))).as("cleaned_md5"))
    counts.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        (col("n_segments") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
  }

  /** Winnowing-style minimizer sketch: over every length-`w` window of
    * token md5 hashes, keep the lexicographic minimum; the document's
    * sketch is its distinct minimizer set. Adjacent windows share
    * minimizers, so the sketch is a deterministic ~1/w-density sample of
    * the token stream that two engines (or two shards of a 100 TB
    * corpus) agree on exactly — the classic local fingerprinting scheme
    * for shard-local near-dup candidate generation. One sliding window
    * min (sort keyed on doc) + one per-doc aggregate; no joins.
    * Returns (idCol, n_windows, n_minimizers, sketch_md5); docs shorter
    * than `w` tokens have an empty sketch.
    */
  def minimizerSketch(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val (base, _) = positionedTokens(df, idCol, textCol)
    val sk = minimizerWindows(df, idCol, textCol, w)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("minz")).as("n_minimizers"),
        md5(array_join(array_sort(collect_set(col("minz"))), ""))
          .as("sketch_md5"))
    base.select(col(idCol))
      .join(sk, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_minimizers"), lit(0L)).as("n_minimizers"),
        coalesce(col("sketch_md5"), md5(lit(""))).as("sketch_md5"))
  }

  /** One row per length-`w` window: (idCol, p, minz) — the long form
    * behind [[minimizerSketch]] (which aggregates it to a per-doc
    * sketch) and [[graft.QueriesJ.t46]]-style candidate generation
    * (which distincts and self-joins it). Windows truncated by the end
    * of the document are excluded.
    */
  def minimizerWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    import org.apache.spark.sql.expressions.Window
    val (base, toks) = positionedTokens(df, idCol, textCol)
    val win = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    toks.withColumn("__h", md5(col("tok")))
      .withColumn("minz", min(col("__h")).over(win))
      .join(base.select(col(idCol), size(col("tk")).cast("long").as("__m")),
        Seq(idCol))
      .where(col("p") <= col("__m") - (w - 1))
      .select(col(idCol), col("p"), col("minz"))
  }

  /** The distinct minimizer POSTING LIST per doc with a document-
    * frequency hub cap (`maxDf`): minimizers shared by more than
    * `maxDf` docs are dropped before any pairing, the same frequent-key
    * prune `Dedup.jaccardPairs` makes — a boilerplate minimizer would
    * otherwise pair everything with everything.
    */
  def minimizerPostings(df: DataFrame, idCol: String, textCol: String,
      w: Int, maxDf: Int): DataFrame = {
    val dm = minimizerWindows(df, idCol, textCol, w)
      .select(col(idCol), col("minz")).distinct()
    val freq = dm.groupBy(col("minz")).agg(count(lit(1)).as("__df"))
    dm.join(freq.where(col("__df") <= maxDf).select(col("minz")), "minz")
  }

  /** The whitespace token stream shared by the vocabulary ops below —
    * same normalization as the frequency/TF-IDF family (lower + trim +
    * `\s+` split, empty tokens dropped).
    */
  private def tokenStream(df: DataFrame, textCol: String,
      carry: Seq[String]): DataFrame =
    df.select(carry.map(col) :+
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"): _*)
      .where(length(col("token")) > 0)

  /** Corpus vocabulary: the `size` most frequent tokens, ties broken
    * lexicographically so the cut is deterministic. One count shuffle +
    * a TakeOrdered top-K — no global window, so the counting side scales
    * with distinct-token cardinality while the result stays broadcast-
    * sized (a vocabulary is small by construction).
    */
  def vocabulary(df: DataFrame, textCol: String, size: Int): DataFrame =
    tokenStream(df, textCol, Seq.empty)
      .groupBy(col("token")).agg(count(lit(1)).as("token_freq"))
      .orderBy(col("token_freq").desc, col("token").asc)
      .limit(size)

  /** Out-of-vocabulary rate per group — the tokenizer-coverage audit an
    * LLM corpus runs before training (a source whose OOV rate spikes is
    * mis-tokenized or off-distribution). The vocabulary is built on the
    * corpus itself and BROADCAST back onto the token stream (it is
    * top-`vocabSize` by construction), so the big side sees one
    * map-side membership probe plus its per-group aggregate: two
    * shuffles total at any corpus size, neither keyed on the token.
    */
  /** DSIR-style importance log-ratio for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169): build unigram bag-of-words LMs of a small
    * TARGET corpus and the big RAW pool over their JOINT vocabulary
    * (add-one smoothing), then score every raw document by the average
    * per-token log probability ratio log(p_target / p_raw) — the
    * importance weight that up-ranks raw docs distributed like the
    * target. The resample step composes downstream: feed
    * `dsir_logratio` to [[Sampling]]'s weighted/temperature samplers
    * (t21/t37) exactly as DSIR feeds its weights to gumbel-top-k.
    *
    * Shuffle ledger at corpus scale: one token-count aggregate (map-side
    * combinable) + one per-doc aggregate; the LM table — vocabulary
    * rows, bounded like [[vocabulary]]'s output — and its one-row
    * totals are BROADCAST back onto the raw token stream, so the big
    * side never shuffles on the token. Docs with zero tokens carry no
    * evidence either way and drop out (same contract as [[vocabulary]]
    * consumers). At web scale DSIR hashes n-grams into a fixed bucket
    * count first; that variant composes by substituting
    * [[FeatureEng.featureHash]]'s bucket for `token` — same two
    * aggregates, bounded LM by construction.
    */
  def importanceLogRatio(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column): DataFrame = {
    val toks = tokenStream(df.withColumn("__tgt", isTarget),
      textCol, Seq(idCol, "__tgt"))
    // one pass over the token stream counts BOTH corpora (the target
    // flag splits inside the aggregate, not the scan)
    val counts = toks.groupBy(col("token"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("c_r"))
      .localCheckpoint(true) // two consumers: totals + the LM join
    val totals = counts.agg(sum(col("c_t")).as("tt"),
      sum(col("c_r")).as("tr"), count(lit(1)).as("v"))
    val lm = counts.crossJoin(broadcast(totals))
      .select(col("token"),
        ((col("c_t") + 1).cast("double") / (col("tt") + col("v")))
          .as("p_t"),
        ((col("c_r") + 1).cast("double") / (col("tr") + col("v")))
          .as("p_r"))
    toks.where(!col("__tgt"))
      .join(broadcast(lm), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("p_t") / col("p_r"))) + lit(1e-9), 6)
          .as("dsir_logratio"))
  }

  /** [[importanceLogRatio]] over HASHED token buckets — the actual DSIR
    * paper construction (Xie et al., arXiv:2302.03169 §2: hashed n-gram
    * features into a fixed bucket space), and the web-scale answer to the
    * exact variant's unbounded joint vocabulary: the LM frame here is AT
    * MOST `buckets` rows BY CONSTRUCTION, so the broadcast stays bounded
    * no matter how many distinct tokens a 100 TB crawl carries. Tokens
    * map to buckets via the engine-portable md5-derived hash
    * ([[Dedup.md5Hash56]] mod `buckets` — the same construction as
    * [[FeatureEng.featureHash]]'s dim hash), so the scores are fully
    * deterministic and hash-oracle-able cross-engine. Add-one smoothing
    * runs over the FIXED bucket space (denominator `total + buckets`,
    * not occupied-bucket count): the LM's support is the hash range
    * itself, which is what makes the smoothing constant under corpus
    * growth. Same shuffle ledger as the exact form — one bucket-count
    * aggregate + one per-doc aggregate, LM and totals broadcast.
    *
    * Hash collisions merge token statistics (the hashing-trick
    * trade-off); OperatorPropertySpec pins that the bucketed scores
    * track the exact scores on the fixtures.
    */
  def importanceLogRatioHashed(df: DataFrame, textCol: String,
      idCol: String, isTarget: Column, buckets: Int): DataFrame = {
    val toks = tokenStream(df.withColumn("__tgt", isTarget),
        textCol, Seq(idCol, "__tgt"))
      .select(col(idCol), col("__tgt"),
        pmod(Dedup.md5Hash56(col("token")), lit(buckets.toLong)).as("bkt"))
    val counts = toks.groupBy(col("bkt"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("c_r"))
      .localCheckpoint(true) // two consumers: totals + the LM join
    val totals = counts.agg(sum(col("c_t")).as("tt"),
      sum(col("c_r")).as("tr"))
    val lm = counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        ((col("c_t") + 1).cast("double") / (col("tt") + lit(buckets)))
          .as("p_t"),
        ((col("c_r") + 1).cast("double") / (col("tr") + lit(buckets)))
          .as("p_r"))
    toks.where(!col("__tgt"))
      .join(broadcast(lm), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("p_t") / col("p_r"))) + lit(1e-9), 6)
          .as("dsir_logratio"))
  }

  def oovByGroup(df: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabulary(df, textCol, vocabSize)
      .select(col("token"), lit(1).as("__in_vocab"))
    tokenStream(df, textCol, Seq(groupCol))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens") + lit(1e-9), 6))
  }

  /** Zipf rank–frequency fit: OLS of ln(count) on ln(rank) over the
    * corpus's `topN` most frequent tokens — the standard power-law
    * diagnostic for corpus health (a natural-language corpus fits slope
    * ≈ −1; templated/boilerplate-heavy corpora flatten, spam steepens).
    *
    * Plan: one token-count aggregate (map-combinable), a global
    * top-`topN` cut via orderBy+limit (TakeOrderedAndProject — per
    * partition heaps, no full sort), then the rank window and the OLS
    * closed form run on the ≤ `topN`-row frame. The only unpartitioned
    * window is over that post-limit frame — bounded by the `topN`
    * constant regardless of corpus size (WindowAuditSpec allowlist).
    * Ties in count break by token ascending on BOTH the cut and the
    * rank, so the fitted points are engine-reproducible exactly.
    *
    * Returns one row: (n_ranks, slope, intercept, r2), rounded 6dp.
    */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 3, s"need topN >= 3 for a meaningful fit; got $topN")
    val freq = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
    val pts = freq
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .select(log(col("__rank")).as("x"), log(col("cnt")).as("y"))
    pts.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_ranks"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) + lit(1e-9), 6)
          .as("slope"),
        round((col("sy") - col("sx") *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) / col("n")
          + lit(1e-9), 6).as("intercept"),
        round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
           (col("n") * col("syy") - col("sy") * col("sy"))) + lit(1e-9), 6)
          .as("r2"))
  }

  /** RAKE keyword extraction (Rose et al. '10): candidate phrases are
    * maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ length of every phrase it appears
    * in — long-phrase words co-occur more), and a phrase scores the sum
    * of its words' scores. Returns the corpus-wide top-`topN` distinct
    * phrases. Phrase boundaries come from a per-document prefix count
    * of stopword positions (a doc-length-bounded window, the standard
    * per-doc shape), NOT a split regex — so both engines segment
    * byte-identically. Word stats are two corpus-wide aggregates on the
    * token grain; the final ordering is on ROUNDED scores with a phrase
    * tie-break, so the top-N cut is deterministic cross-engine.
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stopwords.nonEmpty && topN >= 1, "need stopwords and topN >= 1")
    val tok = docs.select(col(idCol).as("__doc"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("__pos", "__term")))
      .where(col("__term") =!= "")
      .withColumn("__stop",
        when(col("__term").isin(stopwords: _*), 1L).otherwise(0L))
    val wDoc = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phraseTok = tok
      .withColumn("__phrase", sum(col("__stop")).over(wDoc))
      .where(col("__stop") === 0L)
      .localCheckpoint(true) // 3 consumers: lengths, word stats, text
    val phraseLen = phraseTok.groupBy(col("__doc"), col("__phrase"))
      .agg(count(lit(1)).as("__len"))
    val withLen = phraseTok.join(phraseLen, Seq("__doc", "__phrase"))
    val wordScore = withLen.groupBy(col("__term"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__wscore",
        col("__deg").cast("double") / col("__freq"))
    val phraseText = phraseTok.groupBy(col("__doc"), col("__phrase"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__term")))),
        x => x.getField("__term")), " ").as("phrase"))
    val scored = withLen.join(wordScore.select(col("__term"),
        col("__wscore")), "__term")
      .groupBy(col("__doc"), col("__phrase"))
      .agg(sum(col("__wscore")).as("__pscore"),
        count(lit(1)).as("__n_words"))
      .join(phraseText, Seq("__doc", "__phrase"))
    scored.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("__n_words")).as("n_words"),
        round(max(col("__pscore")) + lit(1e-9), 6).as("rake_score"))
      .orderBy(col("rake_score").desc, col("phrase"))
      .limit(topN)
  }

  /** Per-document character-entropy quality screen: Shannon entropy (nats)
    * of the character distribution over a BOUNDED 27-bucket alphabet —
    * the 26 lowercase letters plus one "other" bucket. Very low entropy
    * flags degenerate text (repeated characters, padding, markup soup);
    * the screen every corpus-quality stack runs next to length and
    * stopword ratios. Engineering: each letter count is
    * `length(t) − length(translate(t, c, ""))` — 27 substring scans of
    * one projection, NO per-character explode (the t65 lesson: a row per
    * character is the scale killer; per-LETTER column algebra is
    * corpus-size-independent per row) and no shuffle at all. The entropy
    * fold runs in fixed a→z→other order, so both engines compute
    * bit-identical doubles.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val low = lower(trim(col(textCol)))
    val n = length(low).cast("double")
    val counts: Seq[Column] = ('a' to 'z').map(c =>
      (length(low) - length(translate(low, c.toString, ""))).cast("double"))
    val other = n - counts.reduce(_ + _)
    def term(cnt: Column): Column =
      when(cnt > 0, -(cnt / n) * log(cnt / n)).otherwise(lit(0.0))
    val h = (counts :+ other).map(term).reduce(_ + _)
    docs.where(length(lower(trim(col(textCol)))) > 0)
      .select(col(idCol),
        round(h + lit(1e-9), 6).as("char_entropy"),
        length(low).as("n_chars_norm"))
  }

  /** Positive PMI over directed skip-gram co-occurrences (the classic
    * distributional-semantics statistic behind count-based embeddings;
    * Church & Hanks '90, Levy & Goldberg '14): for token pairs (w1, w2)
    * with w2 at offset +1..`window` after w1,
    * ppmi = max(0, ln(c(w1,w2)·T / (l(w1)·r(w2)))) with T = Σ c, l/r the
    * directed marginals. Plan: one posexplode token stream, a bounded
    * ×window offset explode equi-joined back on (doc, pos) — never a
    * token cross join — then one (w1, w2) count shuffle; marginals and
    * the 1-row total ride the counted pair frame, not the corpus. The
    * `minCount` floor kills hapax-pair noise and the top-N cut orders by
    * ROUNDED ppmi with a (w1, w2) tie-break — deterministic
    * cross-engine.
    */
  def ppmiPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long, topN: Int): DataFrame = {
    require(window >= 1 && topN >= 1, "need window >= 1 and topN >= 1")
    val tok = docs.select(col(idCol).as("doc"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "term")))
      .where(length(col("term")) > 0)
    val t1 = tok
      .withColumn("off", explode(array((1 to window).map(lit(_)): _*)))
      .select(col("doc"), (col("pos") + col("off")).as("pos2"),
        col("term").as("w1"))
    val t2 = tok.select(col("doc"), col("pos").as("pos2"),
      col("term").as("w2"))
    val pairCounts = t1.join(t2, Seq("doc", "pos2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // 4 consumers: total, both marginals, scores
    val totals = pairCounts.agg(sum(col("c")).as("t")) // 1-row scalar
    val lm = pairCounts.groupBy(col("w1")).agg(sum(col("c")).as("lc"))
    val rm = pairCounts.groupBy(col("w2")).agg(sum(col("c")).as("rc"))
    pairCounts.where(col("c") >= minCount)
      .join(lm, "w1").join(rm, "w2").crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c").as("n_cooc"),
        round(greatest(lit(0.0),
          log(col("c").cast("double") * col("t") /
            (col("lc").cast("double") * col("rc")))) + lit(1e-9), 6)
          .as("ppmi"))
      .orderBy(col("ppmi").desc, col("w1"), col("w2")).limit(topN)
  }

  /** Flesch reading-ease readability per document — the classic text
    * difficulty score (206.835 − 1.015·words/sentences −
    * 84.6·syllables/word), with syllables approximated by VOWEL RUNS
    * (the standard cheap estimator) and sentences by terminator runs
    * ([.!?]+, floored at 1). Every count is a RUN count computed as
    * `len(regexp_replace(t, p, "#")) − len(regexp_replace(t, p, ""))`
    * — each run collapses to one char vs zero chars, so the difference
    * counts runs exactly, independent of any '#' already in the text.
    * Three regex scans per row, no explode, no shuffle: corpus-quality
    * screening at scan speed (t70's discipline). Appends n_words /
    * n_syllables / n_sentences / flesch to the input frame.
    */
  def withReadability(df: DataFrame, textCol: String): DataFrame = {
    val low = lower(trim(col(textCol)))
    def runsOf(pattern: String): Column =
      (length(regexp_replace(low, pattern, "#")) -
        length(regexp_replace(low, pattern, ""))).cast("double")
    val words = runsOf("[^\\s]+")
    val syll = runsOf("[aeiou]+")
    val sent = greatest(lit(1.0), runsOf("[.!?]+"))
    df.where(length(lower(trim(col(textCol)))) > 0)
      .withColumn("n_words", words)
      .withColumn("n_syllables", syll)
      .withColumn("n_sentences", sent)
      .withColumn("flesch",
        lit(206.835) - lit(1.015) * (words / sent) -
          lit(84.6) * (syll / words))
  }

  /** Suffix-structure repeated-span profile via PREFIX DOUBLING
    * (Manber–Myers, SODA'90 — the suffix-array construction reduced to
    * rank equivalence): per token position, the largest
    * h ∈ {1, 2, 4, …, 2^maxPow} such that the h-token window starting
    * there occurs at least twice anywhere in the corpus (same or
    * another document). This is [[crossDocSpanScrub]]/t59's at-scale
    * twin (VERDICT r13 #7): the gram-ladder form re-shuffles the full
    * token stream once per LENGTH with ever-wider string keys (the
    * DuckDB oracle runs exactly that as the baseline), while prefix
    * doubling reaches window length 2^maxPow in maxPow self-join
    * rounds over FIXED-WIDTH md5 rank keys — O(log L) shuffle waves,
    * each a (doc, pos) equi-join — which is what survives a 100 TB
    * corpus where 16-token grams as raw shuffle keys do not.
    *
    * rank_1(p) = the token at p; rank_{2h}(p) = md5(rank_h(p) ‖ ' ' ‖
    * rank_h(p+h)), defined only where the full 2h window fits inside
    * the document (suffix windows never cross documents; CROSS-doc
    * repeats are found through rank VALUE equality, not adjacency, so
    * no sentinel plumbing is needed). Two positions share rank_h iff
    * their h-token windows are equal, up to md5 collision — 128-bit,
    * deterministic, and computed over window-injective inputs: the
    * separator is a SPACE, which no operand can contain at any level
    * (level-1 ranks are whitespace-split tokens; level-2+ ranks are
    * fixed-width md5 hex), so the concatenation is injective and the
    * oracle's real-gram comparison agrees. (A ':' separator — ADVICE
    * r14 — was NOT injective at the first doubling: raw tokens may
    * contain ':', so ('a:b','c') and ('a','b:c') collided.)
    *
    * Returns per (non-blank) doc: n_tokens, max_rep_bucket (largest h
    * with a repeated window starting in this doc; 0 if none),
    * n_pos_rep4 / n_pos_rep16 (positions whose 4-/16-token windows
    * repeat) — the profile a scrub pass (t59/t42) uses to size k and
    * to rank documents by boilerplate load.
    */
  def repeatedPrefixBuckets(df: DataFrame, idCol: String, textCol: String,
      maxPow: Int = 4): DataFrame = {
    require(maxPow >= 1 && maxPow <= 6,
      s"need 1 <= maxPow <= 6; got $maxPow")
    val (base, toks) = positionedTokens(df, idCol, textCol)
    val id = col(idCol)
    var rank = toks.select(id, col("p"), col("tok").as("r"))
      .localCheckpoint(true) // each level feeds the next + its rep count
    val levels = scala.collection.mutable.ListBuffer[(Long, DataFrame)]()
    levels += 1L -> rank
    (1 to maxPow).foreach { j =>
      val h = 1L << (j - 1)
      val a = rank.select(id, col("p"), col("r").as("__ra"))
      val b = rank.select(id, (col("p") - h).as("p"), col("r").as("__rb"))
      rank = a.join(b, Seq(idCol, "p"))
        .select(id, col("p"),
          md5(concat(col("__ra"), lit(" "), col("__rb"))).as("r"))
        .localCheckpoint(true)
      levels += (1L << j) -> rank
    }
    // a position repeats at level h iff its rank value occurs >= 2
    // times globally — one count shuffle on the fixed-width rank key
    def repPositions(lvl: DataFrame, h: Long): DataFrame = {
      val dup = lvl.groupBy(col("r")).agg(count(lit(1)).as("__c"))
        .where(col("__c") >= 2).select(col("r"))
      lvl.join(dup, Seq("r"), "left_semi")
        .select(id, col("p"), lit(h).as("h"))
    }
    val reps = levels.toSeq.map { case (h, lvl) => repPositions(lvl, h) }
      .reduce(_.unionByName(_))
    val perDoc = reps.groupBy(id).agg(
      max(col("h")).as("__max_bucket"),
      sum(when(col("h") === 4L, 1L).otherwise(0L)).as("__rep4"),
      sum(when(col("h") === 16L, 1L).otherwise(0L)).as("__rep16"))
    base.select(id, size(col("tk")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(id, col("n_tokens"),
        coalesce(col("__max_bucket"), lit(0L)).as("max_rep_bucket"),
        coalesce(col("__rep4"), lit(0L)).as("n_pos_rep4"),
        coalesce(col("__rep16"), lit(0L)).as("n_pos_rep16"))
  }
}
