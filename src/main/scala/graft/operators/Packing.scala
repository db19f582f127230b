package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Context-window preparation for training pipelines: split long docs
  * into fixed-token-budget chunks, and assign short docs to packed
  * sequences — the two halves of sequence packing. Both are
  * deterministic functions of (id, text) alone, so output is
  * reproducible across runs, partitionings, and cluster sizes, and both
  * are engine-portable enough to carry full DuckDB oracles.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.2).
  */
object Packing {

  /** Split each doc into consecutive `maxTokens`-token chunks:
    * (idCol, chunk_idx, chunk_text), chunk_idx 0-based, last chunk
    * ragged. A pure generator on the scan — no shuffle, output is
    * corpus-sized. Docs of ≤ maxTokens tokens come through as one chunk
    * unchanged.
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val toks = TextFunctions.tokens(col(textCol))
    // NULL text must yield NO chunks: size(NULL) is -1 (non-ANSI), and
    // sequence(0, -2) would count DOWN, emitting phantom NULL chunks
    val chunkArr = when(col(textCol).isNull, array()).otherwise(
      transform(
        sequence(lit(0), floor((size(toks) - 1) / lit(maxTokens)).cast("int")),
        i => array_join(slice(toks, i * maxTokens + 1, lit(maxTokens)), " ")
      )
    )
    df.select(
      col(idCol),
      posexplode(chunkArr).as(Seq("chunk_idx", "chunk_text"))
    )
  }

  /** Greedy sequence packing by prefix sum: assign each doc to a pack of
    * ~`budget` tokens. Docs are spread over `nBuckets` independent
    * streams by `id % nBuckets` (each stream is one window partition —
    * this is what makes the window parallel at 100 TB; a single global
    * ordering would be a one-partition window), ordered by id within the
    * stream, and a doc starts a new pack when the running total crosses
    * the budget. Output adds (pack_bucket, pack_seq): a pack is the
    * (bucket, seq) pair.
    *
    * Semantics: packs average `budget` weight; a doc straddling the
    * boundary overflows its pack rather than splitting (standard
    * distributed-packing behavior — split first with [[chunkByTokens]]
    * if hard caps are needed). `weightCol` is any per-row weight: a
    * token count, n_chars, byte length.
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      nBuckets: Int = 1024
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // NULL ids would all land in the NULL window partition as RANGE-frame
    // peers — one unbounded pack that packTexts would then concatenate
    // into a single giant string. The id defines the pack order, so a
    // NULL id is a contract violation: reject it loudly per row.
    // numeric ids bucket by value (unchanged behavior); any other id
    // type buckets on a deterministic hash ([[Ops.idBucketKey]]). Pack
    // ORDER stays the id's native ordering either way.
    val bucketKey = Ops.idBucketKey(df, idCol)
    val bucket = when(
      col(idCol).isNull,
      raise_error(lit(s"packGreedy: NULL $idCol — pack order needs non-null ids"))
    ).otherwise(pmod(bucketKey, lit(nBuckets)).cast("long"))
    val win = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
    df.withColumn("pack_bucket", bucket)
      .withColumn(
        "pack_seq",
        floor(
          (sum(col(weightCol)).over(win) - col(weightCol)) / lit(budget)
        ).cast("long")
      )
  }

  /** Materialize the packed training sequences: one row per pack with
    * members concatenated in id order plus bookkeeping (member count,
    * total weight). The aggregation is per-pack — groups are ~budget
    * weight by construction, so collect_list state is bounded by the
    * budget, never by the corpus. Output is the text actually fed to a
    * tokenizer; keep [[packGreedy]]'s row-level form when only the
    * assignment is needed.
    */
  def packTexts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      nBuckets: Int = 1024,
      sep: String = " "
  ): DataFrame =
    packGreedy(df, idCol, weightCol, budget, nBuckets)
      .groupBy(col("pack_bucket"), col("pack_seq"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            m => m.getField(textCol)
          ),
          sep
        ).as("pack_text"),
        count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("pack_weight")
      )
}
