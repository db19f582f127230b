package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level text statistics for curation decisions — the mining
  * side of boilerplate/template detection: which n-grams recur ACROSS
  * documents (headers, footers, navigation chrome, license blurbs)?
  * Per-doc signals live in [[graft.functions.TextFunctions]]; these
  * operators aggregate over the corpus.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.2).
  */
object CorpusStats {

  /** Document frequency of word n-grams: the number of distinct docs
    * each n-gram appears in, for grams reaching `minDocs`. Per-doc
    * grams come from the compiled [[TextFunctions.shingleSet]] kernel
    * (a SET — a doc contributes each gram once, so the count IS the
    * document frequency without a per-doc distinct). Scale shape: one
    * generator scan into a map-side-combined count; the shuffle carries
    * (gram, partial count), and `minDocs` prunes the long unique tail
    * at the filter. Grams passing a high threshold relative to corpus
    * size are boilerplate candidates for removal or down-weighting.
    */
  def ngramDocFrequency(
      df: DataFrame,
      textCol: String,
      n: Int,
      minDocs: Long = 2L
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    require(minDocs > 0, s"minDocs must be positive, got $minDocs")
    df.select(explode(TextFunctions.shingleSet(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
  }
}
