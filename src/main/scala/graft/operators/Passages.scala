package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring (passage-level) deduplication, the ExactSubstr
  * component of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL 2022): instead of dropping whole near-dup
  * documents, find the exact token spans that recur ACROSS documents —
  * licence headers, navigation chrome, syndicated paragraphs — and score
  * each document by how much of it is such shared text. The full
  * suffix-array construction of the paper is replaced by sliding
  * fixed-width token windows (a window is duplicated iff every length-w
  * substring of the span is), which distributes as plain group-bys: no
  * global suffix sort, no driver-side state.
  *
  * Scale shape: fingerprints are a pure generator over the scan (split +
  * sequence + posexplode — no shuffle, no data blow-up beyond ~1 row per
  * token); everything downstream is hash-partitioned aggregation on the
  * fingerprint, so a 100 TB corpus is one map stage plus shuffles keyed
  * on 16-byte hashes, never on text. Cross-doc boilerplate makes hot
  * fingerprints BY CONSTRUCTION — the per-doc pre-aggregation collapses
  * within-doc repeats before any fingerprint-keyed exchange, and AQE
  * skew handling splits what remains.
  */
object Passages {

  /** One row per sliding window: (idCol, pos, fp_md5). Pure generator on
    * the scan — tokenization is single-space split (the corpus contract
    * shared with every text oracle), `pos` is the 0-based token offset of
    * the window start, `fp_md5` the md5 of the space-joined window.
    * Documents shorter than `windowTokens` emit nothing.
    */
  def passageFingerprints(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int,
      stride: Int = 1
  ): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be ≥ 1, got $windowTokens")
    require(stride >= 1, s"stride must be ≥ 1, got $stride")
    val toks = split(col(textCol), " ")
    // sequence(0, n) runs DESCENDING when n < 0 — gate on length first
    val starts = when(
      size(toks) >= windowTokens,
      sequence(lit(0), size(toks) - windowTokens, lit(stride))
    ).otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("_toks"), explode(starts).as("pos"))
      .select(
        col(idCol),
        col("pos"),
        md5(array_join(slice(col("_toks"), col("pos") + 1, lit(windowTokens)), " "))
          .as("fp_md5")
      )
  }

  /** Fingerprints occurring in at least `minDocs` distinct documents:
    * (fp_md5, n_docs, n_occ). The corpus-wide duplicated-passage
    * catalogue — at scale this is the table you'd persist and anti-join
    * future crawls against.
    */
  def duplicatedPassages(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int,
      stride: Int = 1,
      minDocs: Int = 2
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be ≥ 2, got $minDocs")
    passageFingerprints(df, textCol, idCol, windowTokens, stride)
      .groupBy(col("fp_md5"))
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occ")
      )
      .filter(col("n_docs") >= minDocs)
  }

  /** Per-document duplicated-passage profile: (idCol, n_windows,
    * n_dup_windows, dup_fraction) where a window is "duplicated" iff its
    * fingerprint occurs in ≥ 2 distinct documents. Documents with no
    * windows (shorter than `windowTokens`) are kept with fraction 0.0.
    *
    * Plan: per-(doc, fp) pre-aggregation → cross-doc count as a window
    * function over the fingerprint (one exchange, no second join) →
    * per-doc rollup; short docs re-enter via a left join from the
    * original table (its id side is aggregate-free, so AQE picks
    * broadcast when the corpus side is small enough).
    */
  def passageDupFraction(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int,
      stride: Int = 1
  ): DataFrame = {
    val perDocFp = passageFingerprints(df, textCol, idCol, windowTokens, stride)
      .groupBy(col(idCol), col("fp_md5"))
      .agg(count(lit(1)).as("_occ"))
    val withDocs = perDocFp.withColumn(
      "_ndocs",
      count(lit(1)).over(Window.partitionBy(col("fp_md5")))
    )
    val perDoc = withDocs
      .groupBy(col(idCol))
      .agg(
        sum(col("_occ")).as("_nwin"),
        sum(when(col("_ndocs") >= 2, col("_occ")).otherwise(0L)).as("_ndup")
      )
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_nwin"), lit(0L)).as("n_windows"),
        coalesce(col("_ndup"), lit(0L)).as("n_dup_windows"),
        (coalesce(col("_ndup"), lit(0L)).cast("double") /
          greatest(coalesce(col("_nwin"), lit(0L)), lit(1L))).as("dup_fraction")
      )
  }

  /** Drop documents whose cross-doc duplicated-window fraction exceeds
    * `maxDupFraction` — the document-level retention rule built on
    * [[passageDupFraction]] (RefinedWeb-style: a doc that is mostly
    * shared boilerplate carries little novel training signal).
    */
  def dropDuplicatedPassageDocs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int,
      maxDupFraction: Double,
      stride: Int = 1
  ): DataFrame = {
    require(
      maxDupFraction >= 0.0 && maxDupFraction <= 1.0,
      s"maxDupFraction must be in [0, 1], got $maxDupFraction"
    )
    val keep = passageDupFraction(df, textCol, idCol, windowTokens, stride)
      .filter(col("dup_fraction") <= maxDupFraction)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
