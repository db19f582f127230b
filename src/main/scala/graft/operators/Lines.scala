package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the C4 / Dolma pipeline step that
  * passage dedup does not cover: drop individual LINES (newline-delimited,
  * the unit web boilerplate actually arrives in — nav chrome, cookie
  * banners, footers) that recur across many documents, keeping the rest
  * of each document intact (reference big.data.table has no text
  * operators; this extends the training-data north-star set next to
  * [[Passages]], which handles fixed-width token windows instead).
  *
  * Scale shape mirrors [[Passages]]: line fingerprints are a pure
  * generator over the scan (split + posexplode, ~1 row per line, no
  * shuffle); the per-(doc, fp) pre-aggregation collapses within-doc
  * repeats BEFORE any fingerprint-keyed exchange; corpus-wide doc
  * frequency is a map-side-combinable two-level aggregate; and removal is
  * an anti-join of the line table against the hot-line set — which is
  * bounded by the corpus' boilerplate volume, so AQE broadcasts it in the
  * common case and splits residual skew otherwise (a window function
  * partitioned by fingerprint would serialize each hot line into one
  * task). Reassembly shuffles once, keyed on the doc id.
  */
object Lines {

  /** One row per line: (idCol, pos, _fp, _line) where `pos` is the
    * 0-based line index. `_fp` is md5 hex (STRING, the oracle key —
    * engine-identical in DuckDB) or xxhash64 (LONG, 4× narrower for
    * corpus-scale shuffles) of the exact line text. Empty lines
    * participate like any other line — a corpus-hot empty line is
    * boilerplate too.
    *
    * `delimiter` selects the dedup granularity: "\n" = C4-style lines
    * (default), "\n\n" = Dolma-style PARAGRAPHS. Any literal delimiter
    * is lossless: split-on-literal + join-with-the-same-literal
    * round-trips byte-identically (the delimiter is regex-quoted before
    * reaching `split`).
    */
  private def lineFps(
      df: DataFrame,
      textCol: String,
      idCol: String,
      hash64: Boolean,
      delimiter: String = "\n"
  ): DataFrame =
    df.select(
        col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delimiter)))
          .as(Seq("_pos", "_line"))
      )
      .select(
        col(idCol),
        col("_pos"),
        col("_line"),
        (if (hash64) xxhash64(col("_line")) else md5(col("_line"))).as("_fp")
      )

  /** Lines occurring in at least `minDocs` distinct documents:
    * (fp_md5 | fp_x64, n_docs, n_occ). The corpus boilerplate-line
    * catalogue — persist it and anti-join future crawls, exactly like
    * the passage catalogue ([[Passages.duplicatedPassages]]).
    */
  def duplicatedLines(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Int = 2,
      hash64: Boolean = false,
      delimiter: String = "\n"
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be ≥ 2, got $minDocs")
    lineFps(df, textCol, idCol, hash64, delimiter)
      .groupBy(col(idCol), col("_fp"))
      .agg(count(lit(1)).as("_occ"))
      .groupBy(col("_fp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_occ")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .withColumnRenamed("_fp", if (hash64) "fp_x64" else "fp_md5")
  }

  /** Remove every line whose distinct-document frequency is ≥ `minDocs`,
    * preserving the order of surviving lines; returns (idCol, textCol)
    * with the cleaned text. Documents whose every line was removed are
    * KEPT with empty text — dropping whole documents is a separate
    * policy decision ([[Passages.dropDuplicatedPassageDocs]] shape), and
    * a pipeline can trivially `filter(length(text) > 0)` after.
    *
    * The newline split/join round-trip is lossless, so untouched
    * documents come back byte-identical.
    *
    * The line generator runs twice (once under the doc-frequency agg,
    * once for reassembly) — deliberately, unlike
    * [[Passages.passageDupFraction]] which checkpoints its shared
    * per-(doc, fp) table: the table BOTH consumers need here is the raw
    * line table carrying the text itself, and pinning corpus-scale text
    * in block storage costs more than one extra embarrassingly-parallel
    * map stage over the scan.
    */
  def dropDuplicatedLines(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Int = 2,
      hash64: Boolean = true,
      delimiter: String = "\n"
  ): DataFrame = {
    val lines = lineFps(df, textCol, idCol, hash64, delimiter)
    val hot = duplicatedLines(df, textCol, idCol, minDocs, hash64, delimiter)
      .select(col(if (hash64) "fp_x64" else "fp_md5").as("_fp"))
    val kept = lines
      .join(hot, Seq("_fp"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x.getField("_line")
          ),
          delimiter
        ).as(textCol)
      )
    // re-admit fully-boilerplate documents with empty text; NULL-text
    // documents (whose split() produced no line rows at all) come back
    // NULL, not '' — "untouched documents come back byte-identical"
    // must hold for NULL too
    df.select(col(idCol), col(textCol).isNull.as("_srcnull"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        when(col("_srcnull"), lit(null).cast("string"))
          .otherwise(coalesce(col(textCol), lit("")))
          .as(textCol)
      )
  }

  // --------------------------- persisted line-catalogue index

  /** Handle for a persisted line catalogue: ONE bucketed catalog table
    * of per-fingerprint distinct-document counts `(_fp, _ndocs)`,
    * bucketed by `_fp` so incremental probes aggregate and join the
    * corpus side with zero Exchange. Appends add rows per fingerprint
    * (counts are summed at probe time), so folding a delta in is a pure
    * bucketed append — no read-modify-write of the history. The sixth
    * member of the incremental index family (MinHash d08, SimHash64
    * d09, vector-LSH d13, passages d18, SimHash128 d22).
    */
  case class LineIndex(
      fpTable: String,
      hash64: Boolean,
      buckets: Int,
      delimiter: String = "\n")

  /** Per-fingerprint distinct-document counts for `df` — the rows both
    * [[writeLineIndex]] and [[appendToLineIndex]] persist.
    */
  private def fpDocCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      hash64: Boolean,
      delimiter: String = "\n"
  ): DataFrame =
    lineFps(df, textCol, idCol, hash64, delimiter)
      .select(col(idCol), col("_fp"))
      .distinct()
      .groupBy(col("_fp"))
      .agg(count(lit(1)).as("_ndocs"))

  /** The rows the catalogue persists for `df` — TWO kinds in ONE
    * bucketed table (schema `(_fp, _ndocs, _did)`): per-fingerprint
    * distinct-doc COUNT rows (`_did` NULL) and one LEDGER row per doc
    * (`_fp`/`_ndocs` NULL, `_did` = the doc id). The counts are all any
    * probe reads; the ledger records which docs have been folded in —
    * the replay-safety anchor for [[dropDuplicatedLinesIncrementalFold]]
    * ([[graft.operators.ReplaySafe]]). They share one table precisely
    * so one append = ONE Spark write job = counts and ledger commit
    * ATOMICALLY (two tables would reopen a crash window between the
    * appends). Ledger rows hash to the NULL `_fp` bucket; they are
    * id-sized, written once per doc, and every count-side read filters
    * them out on `_fp IS NOT NULL`. (Schema v2 — a pre-existing
    * two-column catalogue must be rebuilt with [[writeLineIndex]]; its
    * ingest history cannot be reconstructed into a ledger.)
    */
  private def catalogueRows(
      df: DataFrame,
      textCol: String,
      idCol: String,
      hash64: Boolean,
      delimiter: String
  ): DataFrame = {
    val fpType = if (hash64) "bigint" else "string"
    fpDocCounts(df, textCol, idCol, hash64, delimiter)
      .select(col("_fp"), col("_ndocs"), lit(null).cast("bigint").as("_did"))
      .unionByName(
        df.select(
          lit(null).cast(fpType).as("_fp"),
          lit(null).cast("bigint").as("_ndocs"),
          col(idCol).cast("bigint").as("_did")))
  }

  /** Build and persist a line catalogue for `df` under catalog table
    * `<name>_linefps`. `hash64 = true` (default) stores LONG keys — the
    * index is nothing but fingerprints (plus the id-sized replay
    * ledger, [[catalogueRows]]), so the 4× narrower key dominates its
    * footprint.
    */
  def writeLineIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      name: String,
      hash64: Boolean = true,
      buckets: Int = 32,
      delimiter: String = "\n"
  ): LineIndex = {
    val idx = LineIndex(s"${name}_linefps", hash64, buckets, delimiter)
    Dedup.writeBucketedTable(
      catalogueRows(df, textCol, idCol, hash64, delimiter),
      idx.fpTable,
      buckets,
      Seq("_fp"),
      org.apache.spark.sql.SaveMode.Overwrite
    )
    idx
  }

  /** Fold a delta into an existing line catalogue (after it was cleaned
    * via [[dropDuplicatedLinesIncremental]]) so the NEXT delta cleans
    * against corpus ∪ this delta.
    */
  def appendToLineIndex(
      delta: DataFrame,
      textCol: String,
      idCol: String,
      idx: LineIndex
  ): Unit =
    Dedup.writeBucketedTable(
      catalogueRows(delta, textCol, idCol, idx.hash64, idx.delimiter),
      idx.fpTable,
      idx.buckets,
      Seq("_fp"),
      org.apache.spark.sql.SaveMode.Append
    )

  /** Clean a delta against the persisted catalogue: remove every delta
    * line whose distinct-document frequency across corpus ∪ delta is
    * ≥ `minDocs` — result-identical (per delta doc) to
    * [[dropDuplicatedLines]] over the full union, without rescanning
    * the corpus. The corpus side is a bucketed scan aggregated on its
    * own bucket key (`_fp`) and then joined on it — zero corpus-side
    * Exchange; only the delta's fingerprints shuffle, into the index's
    * partitioning. NOTE: a delta document must not already be in the
    * index (same contract as every incremental probe in the family).
    */
  def dropDuplicatedLinesIncremental(
      delta: DataFrame,
      textCol: String,
      idCol: String,
      idx: LineIndex,
      minDocs: Int = 2
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be ≥ 2, got $minDocs")
    val deltaCounts = fpDocCounts(delta, textCol, idCol, idx.hash64, idx.delimiter)
    cleanedAgainstCounts(delta, textCol, idCol, idx, minDocs, deltaCounts)
  }

  /** Probe-then-append in ONE delta pass: clean the delta against the
    * catalogue as it stands, then fold the delta's line counts in — the
    * per-batch body of the unbounded-ingest loop (st02, and any
    * foreachBatch caller). Semantically identical to
    * [[dropDuplicatedLinesIncremental]] followed by
    * [[appendToLineIndex]] (gated), but the delta's line
    * fingerprint/doc-count pass runs ONCE: the same counts frame feeds
    * the hot-line probe and the append.
    *
    * Cost note (measured at sf0.1): unlike the minhash/passage folds —
    * whose probes checkpoint internally either way, so folding strictly
    * saves work — this fold must ADD a checkpoint of the cleaned text
    * to pin the probe-before-append ordering. Isolated A/B at sf0.1
    * read both forms at 3.9-4.3 s (within the box noise floor): the
    * saved fpDocCounts pass and the added text materialization roughly
    * cancel at this scale. At ingest scale the fold still reads the
    * delta text once instead of twice, which dominates when the corpus
    * scan, not the block write, is the bottleneck.
    */
  def dropDuplicatedLinesIncrementalFold(
      delta: DataFrame,
      textCol: String,
      idCol: String,
      idx: LineIndex,
      minDocs: Int = 2,
      sink: Option[DataFrame => Unit] = None
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be ≥ 2, got $minDocs")
    val spark = delta.sparkSession
    // REPLAY SAFETY ([[graft.operators.ReplaySafe]]): docs already in
    // the catalogue's ledger ([[catalogueRows]]) are dropped up front —
    // their counts are committed (counts + ledger land in ONE atomic
    // append), so cleaning the remaining docs against the catalogue
    // as-is IS the batch-on-union semantics, a full replay emits and
    // appends nothing, and the catalogue never double-counts a line
    val rids = ReplaySafe.ids(delta, idCol)
    val seen = ReplaySafe.seenIds(
      spark.table(idx.fpTable).filter(col("_did").isNotNull), "_did", rids)
    val fresh = ReplaySafe.dropSeen(delta, idCol, seen)
    val deltaCounts = fpDocCounts(fresh, textCol, idCol, idx.hash64, idx.delimiter)
      .localCheckpoint(true)
    val lazyOut =
      cleanedAgainstCounts(fresh, textCol, idCol, idx, minDocs, deltaCounts)
    // materializes the cleaned text BEFORE the append mutates the table
    val out = lazyOut.localCheckpoint(true)
    sink.foreach(_(out)) // persist before the ledger append ([[graft.operators.IdempotentSink]])
    val fpType = if (idx.hash64) "bigint" else "string"
    Dedup.writeBucketedTable(
      deltaCounts
        .select(col("_fp"), col("_ndocs"), lit(null).cast("bigint").as("_did"))
        .unionByName(fresh.select(
          lit(null).cast(fpType).as("_fp"),
          lit(null).cast("bigint").as("_ndocs"),
          col(idCol).cast("bigint").as("_did"))),
      idx.fpTable, idx.buckets, Seq("_fp"),
      org.apache.spark.sql.SaveMode.Append)
    // release ONLY the internal checkpoints: lazyOut's plan also contains
    // the CALLER's delta blocks (lineFps and the re-admission join read
    // the delta directly), which are the caller's to free
    graft.CacheUtil.release(deltaCounts)
    graft.CacheUtil.release(seen)
    graft.CacheUtil.release(rids)
    out
  }

  private def cleanedAgainstCounts(
      delta: DataFrame,
      textCol: String,
      idCol: String,
      idx: LineIndex,
      minDocs: Int,
      deltaCounts: DataFrame
  ): DataFrame = {
    val spark = delta.sparkSession
    val lines = lineFps(delta, textCol, idCol, idx.hash64, idx.delimiter)
    // appends leave multiple rows per fp; summing on the bucket key
    // plans as a bucketed scan + partial agg with no Exchange. Ledger
    // rows (NULL _fp) are filtered out — counts only.
    val corpusCounts = spark
      .table(idx.fpTable)
      .filter(col("_fp").isNotNull)
      .groupBy(col("_fp"))
      .agg(sum(col("_ndocs")).as("_corpus_ndocs"))
    val hot = deltaCounts
      .join(corpusCounts, Seq("_fp"), "left")
      .filter(
        col("_ndocs") + coalesce(col("_corpus_ndocs"), lit(0L)) >= minDocs
      )
      .select(col("_fp"))
    val kept = lines
      .join(hot, Seq("_fp"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x.getField("_line")
          ),
          idx.delimiter
        ).as(textCol)
      )
    // same NULL-preserving re-admission as [[dropDuplicatedLines]]
    delta.select(col(idCol), col(textCol).isNull.as("_srcnull"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        when(col("_srcnull"), lit(null).cast("string"))
          .otherwise(coalesce(col(textCol), lit("")))
          .as(textCol)
      )
  }

  /** Compact the line catalogue after many appends: merge the
    * per-append count rows into one row per fingerprint (probes sum at
    * read time either way — compaction keeps the sum but shrinks the
    * table back to one row and one file set per bucket). See
    * [[Dedup.compactBucketedIndexTable]] for the swap mechanics.
    */
  def compactLineIndex(
      spark: org.apache.spark.sql.SparkSession,
      idx: LineIndex
  ): Unit =
    Dedup.compactBucketedIndexTable(
      spark,
      idx.fpTable,
      idx.buckets,
      Seq("_fp"),
      t => {
        // merge the count rows; carry the ledger rows through unchanged
        // (deduped — a doc's ledger row is unique per the disjoint-
        // delta contract, but a replay-healed table may hold one copy)
        val counts = t
          .filter(col("_did").isNull)
          .groupBy(col("_fp"))
          .agg(sum(col("_ndocs")).as("_ndocs"))
          .select(col("_fp"), col("_ndocs"), lit(null).cast("bigint").as("_did"))
        val ledger = t.filter(col("_did").isNotNull).distinct()
        counts.unionByName(ledger)
      }
    )
}
