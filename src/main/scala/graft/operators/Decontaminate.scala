package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: remove (or flag) corpus documents that
  * share word n-grams with an evaluation/benchmark set, so trained
  * models are not scored on memorized training text. The standard
  * n-gram-collision formulation from the GPT-3 appendix-C / PaLM
  * contamination analyses (public papers), built Spark-first.
  *
  * Scale contract (100 TB corpus, MB-scale benchmark): the benchmark
  * side is always the small side — its distinct n-gram set is
  * broadcast, so the corpus is processed in a single scan with NO
  * corpus-side shuffle. Per-doc n-grams come from the compiled
  * [[TextFunctions.shingleSet]] kernel (one pass per row, stays in
  * whole-stage codegen); the only shuffled data is the matched
  * (doc id, gram) stream, which is output-sized, not corpus-sized.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.2):
  * the reference engine (/root/reference/R/big.data.table.R) forwards
  * arbitrary per-node queries but has no text-pipeline operators.
  */
object Decontaminate {

  /** Distinct word n-grams of the benchmark, deduplicated across docs —
    * the probe set a decontamination pass broadcasts. Exposed so a
    * pipeline can persist it once and reuse it across daily corpus
    * deltas (the benchmark changes far less often than the corpus).
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench
      .select(explode(TextFunctions.shingleSet(col(textCol), n)).as("_gram"))
      .distinct()

  /** Contaminated doc ids with their evidence: (idCol, hits) where
    * `hits` = number of DISTINCT benchmark n-grams the doc shares
    * (shingleSet is a set, so the count is per distinct gram). Docs with
    * fewer than `minMatches` collisions are not reported.
    *
    * The benchmark gram set is broadcast (it is the small side by
    * contract); the groupBy aggregates only matched rows, so the
    * shuffle is bounded by the contamination volume, not the corpus.
    */
  def contaminationReport(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      minMatches: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    contaminationReportAgainstGrams(
      corpus, textCol, idCol, benchmarkGrams(bench, benchTextCol, n),
      n, minMatches, broadcastBench)
  }

  /** [[contaminationReport]] against a PRE-BUILT benchmark gram frame
    * ([[benchmarkGrams]], persisted or checkpointed by the caller) —
    * the per-batch body of a streaming decontamination loop (st03): the
    * benchmark changes far less often than the corpus, so rebuilding
    * its gram set per delta would re-scan and re-aggregate static data
    * every batch.
    */
  def contaminationReportAgainstGrams(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      grams: DataFrame,
      n: Int,
      minMatches: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    require(minMatches > 0, s"minMatches must be positive, got $minMatches")
    // escape hatch for a benchmark too large for executor memory
    // (broadcastBench = false → shuffle hash/sort-merge on the gram):
    // with it the corpus gram stream shuffles, so prefer splitting the
    // benchmark and unioning reports if the probe set is merely large
    val probe = if (broadcastBench) broadcast(grams) else grams
    corpus
      .select(col(idCol), explode(TextFunctions.shingleSet(col(textCol), n)).as("_gram"))
      .join(probe, "_gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minMatches)
  }

  /** The corpus with contaminated docs removed: anti-join against
    * [[contaminationReport]]'s id set. Two corpus scans by design (one
    * to find the contaminated ids, one to filter). The id set is
    * materialized (localCheckpoint — it is contamination-sized) and
    * COUNTED, and the anti-join is broadcast-hinted only when the count
    * is actually small: a static-stats decision would near-always pick
    * a corpus-shuffling sort-merge join (the aggregate's size estimate
    * is a product of child estimates), while an unconditional hint
    * would OOM the driver on a benchmark that pathologically overlaps
    * the corpus. Measuring is one cheap action on already-computed
    * blocks. Release the returned plan's blocks with
    * [[graft.CacheUtil.release]] when done; a pipeline that cannot
    * afford the second corpus scan should persist the report and push
    * the filter into its next corpus read.
    */
  def decontaminate(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      minMatches: Int = 1,
      broadcastBench: Boolean = true,
      maxBroadcastIds: Long = 10_000_000L
  ): DataFrame =
    decontaminateAgainstGrams(
      corpus, textCol, idCol, benchmarkGrams(bench, benchTextCol, n),
      n, minMatches, broadcastBench, maxBroadcastIds)

  /** [[decontaminate]] against a PRE-BUILT benchmark gram frame — see
    * [[contaminationReportAgainstGrams]] for when to prefer it.
    */
  def decontaminateAgainstGrams(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      grams: DataFrame,
      n: Int,
      minMatches: Int = 1,
      broadcastBench: Boolean = true,
      maxBroadcastIds: Long = 10_000_000L
  ): DataFrame = {
    val bad = contaminationReportAgainstGrams(
      corpus, textCol, idCol, grams, n, minMatches, broadcastBench)
      .select(col(idCol))
      .localCheckpoint(true)
    val hinted = if (bad.count() <= maxBroadcastIds) broadcast(bad) else bad
    corpus.join(hinted, Seq(idCol), "left_anti")
  }
}
