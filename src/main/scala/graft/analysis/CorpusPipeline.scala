package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Training-corpus preparation as one lazy composition — the end-to-end
  * flow the extension operators exist for:
  *
  *   quality features → threshold filter → language ID → language filter
  *   → dup-span-ratio filter (repeated 3-gram coverage, boilerplate
  *   screen; off by default) → exact dedup (content hash, keep smallest
  *   id) → near-dup candidate removal (MinHash-LSH, drop the larger id
  *   of each pair) → stable train/val/test split.
  *
  * Every stage is a DataFrame→DataFrame transform; the near-dup removal
  * is the only self-join, and it runs on LSH buckets, not all pairs.
  */
object CorpusPipeline {

  case class Config(
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.5,
      keepLangs: Seq[String] = Nil, // empty = keep all
      // docs whose repeated-3-gram span coverage (t42's n_removed /
      // n_tokens) exceeds this are dropped as internal boilerplate;
      // 1.0 = disabled (the ratio is strictly < 1: a gram's first
      // occurrence can never be covered)
      maxDupSpanRatio: Double = 1.0,
      nearDupThreshold: Double = 0.7,
      valPct: Int = 10,
      testPct: Int = 10)

  def prepare(docs: DataFrame, textCol: String, idCol: String,
      config: Config = Config()): DataFrame = {
    val featured = TextAnalysis.withLanguageId(
      TextAnalysis.withQualityFeatures(docs, textCol), textCol)

    val qualityFiltered = featured
      .where(col("n_tokens") >= config.minTokens &&
        (col("punct_ratio").isNull ||
          col("punct_ratio") <= config.maxPunctRatio))

    val langFiltered =
      if (config.keepLangs.isEmpty) qualityFiltered
      else qualityFiltered.where(col("lang_pred").isin(config.keepLangs: _*))

    // internal-boilerplate screen: drop docs dominated by their own
    // repeated 3-gram spans (one doc-keyed aggregate; left join so docs
    // the scrub never sees — blank text — pass through untouched)
    val spanFiltered =
      if (config.maxDupSpanRatio >= 1.0) langFiltered
      else {
        val ratios = TextAnalysis.repeatedSpanScrub(langFiltered, idCol,
            textCol, k = 3)
          .select(col(idCol), (col("n_removed").cast("double") /
            col("n_tokens")).as("__dup_ratio"))
        langFiltered.join(ratios, Seq(idCol), "left")
          .where(col("__dup_ratio").isNull ||
            col("__dup_ratio") <= config.maxDupSpanRatio)
          .drop("__dup_ratio")
      }

    // exact dedup: keep the smallest id per content hash
    val exactSurvivors = Dedup.exactTextDedup(spanFiltered, textCol, idCol)
      .select(col(idCol))
    val exactDeduped = spanFiltered.join(exactSurvivors, Seq(idCol),
      "left_semi")

    // near-dup removal: of each candidate pair, the larger id drops
    val nearDupLosers = Dedup.minHashLshPairs(exactDeduped, textCol, idCol,
        shingleSize = 3, numHashes = 32, rowsPerBand = 4,
        threshold = config.nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exactDeduped.join(nearDupLosers, Seq(idCol),
      "left_anti")

    Sampling.withSplit(nearDeduped, idCol, config.valPct, config.testPct)
  }
}
