package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** At-least-once replay safety for the probe-then-append fold family
  * (`*IncrementalFold`). Structured Streaming's foreachBatch contract
  * is at-least-once: a crash AFTER a fold appended its delta to the
  * index but BEFORE the sink write / offset-log commit makes the engine
  * REPLAY the whole micro-batch — and a naive fold would then (a)
  * append the delta's rows a second time (duplicate index rows,
  * corrupted counts) and (b) probe an index that already contains the
  * batch, emitting duplicate pairs. st07 proved the CLEAN-restart case
  * (stop between micro-batches); this module closes the mid-batch
  * replay case, the per-node retry analog of the reference's per-node
  * `try` wrapper (`/root/reference/R/big.data.table.R:127` — a
  * re-shipped expression must be safe to re-run).
  *
  * The mechanism is the index itself as the replay ledger — no batchId
  * bookkeeping, no extra commit protocol, so it composes with ANY
  * at-least-once caller, not just Structured Streaming:
  *
  *  - [[seenIds]]: delta ids already present in an id-bearing index
  *    table (a column-pruned corpus scan behind a broadcast semi join —
  *    the corpus side keeps its bucketed zero-Exchange scan shape).
  *    Empty on a first attempt; the whole delta after a committed
  *    append; a strict subset after a TORN append (see the torn-append
  *    paragraph below — every consumer of this set is per-id, so a
  *    subset is handled, not an error state).
  *  - [[excludeIds]]: corpus reads inside the probe drop the delta's
  *    own ids (broadcast anti), restoring the pre-append index state on
  *    a replay. On a first attempt the delta's ids are not there — the
  *    filter is a no-op and the emitted result is unchanged (the fold
  *    == probe + append gates still hold).
  *  - emission suppression: output rows whose delta participants were
  *    ALL already folded in are dropped ([[dropSeen]] for per-doc
  *    outputs, [[keepPairsTouchingUnseen]] for pair outputs) — a full
  *    replay emits NOTHING and appends NOTHING, so the union of
  *    per-attempt emissions carries no duplicate rows and the index
  *    never grows twice.
  *  - append filtering: each table's append drops the rows that TABLE
  *    already holds (per-id for one-row-per-id tables, per row
  *    identity key for multi-row ones — the torn-append paragraph), so
  *    a crash between two appends of a multi-table family (minhash
  *    bands/shingles, vector-LSH bands/vecs) heals on replay: the
  *    committed table skips, the missing one completes, and the
  *    emission ledger (the LAST-appended table) still reads "unseen",
  *    so the re-derived emissions — which the caller never received —
  *    are re-emitted.
  *
  * Torn appends: the ledger mechanism does not require an append to be
  * all-or-nothing — if a crash lands mid job-commit and only part of a
  * table's delta rows were moved in (FileOutputCommitter's job commit
  * is not atomic under driver death), the replay completes the missing
  * rows, converging to the same table state as a clean fold. For the
  * one-row-per-id tables (shingles, vectors, IVF lists, the exact fp
  * table keyed by the fp itself) the per-id filters give this for
  * free. The multi-row-per-id tables (minhash bands, simhash chunks,
  * vector-LSH bands, passage windows) need ROW-level healing: a tear
  * can land WITHIN one id (a doc's 16 band rows span up to 16 bucketed
  * files), leaving it "seen" by id with rows missing — so their
  * appends use [[rowKeysPresent]]/[[dropRowsPresent]] (a null-safe
  * anti-join on the row identity key) instead of a per-id drop.
  * Re-derivation is deterministic (admission excludes the delta's
  * stored rows and ranks by id), so completing exactly the
  * absent rows reconstructs the clean-fold table. The first attempt
  * never pays for this: [[noneSeen]] gates the row-level path to
  * replays (no delta id in the table ⇒ the plain append is already
  * correct). The line catalogue is the one family NEITHER granularity
  * can heal — its count rows are batch-level AGGREGATES, not identity
  * rows — so it gates visibility behind a per-batch single-row commit
  * marker instead ([[Lines.catalogueRows]]): a torn batch is invisible
  * and the replay re-derives it whole. The one thing a torn LEDGER
  * append costs is emissions: ids whose ledger rows did commit read
  * "seen" on replay, so their
  * never-delivered pairs are suppressed — recoverable only via the
  * sink path below, which is why at-least-once callers should pass a
  * sink rather than rely on the ledger alone.
  *
  * What this does NOT give by itself: a crash after BOTH the appends
  * and the fold's return but before the caller persisted the emissions
  * loses those emissions (the replay suppresses them). That is the
  * sink's half of exactly-once, closed by each fold's optional `sink`
  * callback — invoked on the materialized emission frame BEFORE the
  * first index append, so emissions are durable by the time the replay
  * ledger can suppress them — with [[IdempotentSink]] (atomic
  * rename-committed per-batch parquet dirs, first write wins) as the
  * canonical callback. A fold called without a sink keeps the
  * document-it-yourself contract above.
  */
private[operators] object ReplaySafe {

  /** The delta's ids as a one-column `_rid` frame. Not distinct — it is
    * only ever the broadcast side of semi/anti joins, where duplicates
    * cannot change the result (delta ids are unique per the family
    * contract anyway). MATERIALIZED (localCheckpoint) so that the lazy
    * probe plans it is spliced into reference a leaf of OURS, never the
    * caller's delta blocks — `CacheUtil.release` walks the whole plan,
    * and a fold releasing its internal lazy frames must not free the
    * caller's checkpoints (the fold-family release contract). Folds
    * release it before returning.
    */
  def ids(delta: DataFrame, idCol: String): DataFrame =
    delta.select(col(idCol).as("_rid")).localCheckpoint(true)

  /** `corpus` without the delta's ids: a broadcast anti join, so the
    * corpus side keeps its bucketed, Exchange-free scan shape. On a
    * first attempt (ids absent) this is a semantic no-op.
    */
  def excludeIds(corpus: DataFrame, idColName: String, ids: DataFrame): DataFrame =
    corpus.join(broadcast(ids), corpus(idColName) === ids("_rid"), "left_anti")

  /** Delta ids already present in `corpus(idColName)` — the replay
    * ledger read. Materialized eagerly (it must snapshot the PRE-append
    * state, and it feeds several later filters); tiny by construction
    * (≤ the micro-batch's id count). Callers release.
    */
  def seenIds(corpus: DataFrame, idColName: String, ids: DataFrame): DataFrame =
    corpus
      .select(col(idColName).as("_rid"))
      .join(broadcast(ids), Seq("_rid"), "left_semi")
      .distinct()
      .localCheckpoint(true)

  /** Delta ids NOT in `seen` — the docs whose emissions have never been
    * handed to a caller. Materialized; tiny. Callers release.
    */
  def unseenIds(ids: DataFrame, seen: DataFrame): DataFrame =
    ids
      .join(broadcast(seen), Seq("_rid"), "left_anti")
      .distinct()
      .localCheckpoint(true)

  /** Rows of `df` whose `colName` is not in `seen` (broadcast anti) —
    * the append filter, and the emission filter for per-doc outputs.
    */
  def dropSeen(df: DataFrame, colName: String, seen: DataFrame): DataFrame =
    df.join(broadcast(seen), df(colName) === seen("_rid"), "left_anti")

  /** True iff `seen` (a materialized [[seenIds]] frame) is empty — the
    * first-attempt fast path. When NO delta id has rows in a table, the
    * plain append is already correct, so the fold skips the row-level
    * heal ([[rowKeysPresent]]/[[dropRowsPresent]]) entirely and the
    * first-attempt plan carries no extra join. Cheap: `seen` is a tiny
    * materialized frame, so this is a take(1) over cached blocks.
    */
  def noneSeen(seen: DataFrame): Boolean = seen.isEmpty

  /** The row identity keys (`keyCols` tuples) the table already holds
    * for the delta's ids — the ROW-level replay ledger for
    * multi-row-per-id tables, where a torn job commit can land WITHIN
    * one id. Materialized eagerly: it must snapshot the PRE-append
    * state, and the append that consumes it writes into the very table
    * it reads. Bounded by the delta's ids × rows-per-id (bands/chunks:
    * a small constant; passage windows: the delta's window count) and
    * only ever computed on the replay path ([[noneSeen]] gates it).
    * Callers release after the append.
    */
  def rowKeysPresent(
      corpus: DataFrame,
      idColName: String,
      ids: DataFrame,
      keyCols: Seq[String]
  ): DataFrame =
    corpus
      .join(broadcast(ids), corpus(idColName) === ids("_rid"), "left_semi")
      .select(keyCols.map(col): _*)
      .distinct()
      .localCheckpoint(true)

  /** Rows of `df` whose `keyCols` tuple is absent from `present` (a
    * [[rowKeysPresent]] frame) — the row-level append filter: a replay
    * after a torn append completes exactly the missing rows of every
    * id, duplicating none. Null-safe per column (defensive — row kinds
    * with NULL key columns existed in schema v2 and may be planted in
    * tests). Join strategy is AQE's call: `present` is
    * materialized, so an empty/small set broadcasts and a full replay's
    * set sort-merges.
    */
  def dropRowsPresent(
      df: DataFrame,
      present: DataFrame,
      keyCols: Seq[String]
  ): DataFrame = {
    val p = present.toDF(keyCols.map("_prs_" + _): _*)
    val cond = keyCols.map(k => df(k) <=> p("_prs_" + k)).reduce(_ && _)
    df.join(p, cond, "left_anti")
  }

  /** Pair rows with at least one endpoint in `unseen` — i.e. suppress a
    * pair only when every delta-side participant was already folded in
    * (corpus-side endpoints are never delta ids, so any pair touching a
    * genuinely-new doc survives; on a first attempt every emitted pair
    * touches the delta by construction and nothing is dropped).
    */
  def keepPairsTouchingUnseen(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      unseen: DataFrame
  ): DataFrame = {
    val ua = unseen.select(col("_rid").as("_unseen_a"))
    val ub = unseen.select(col("_rid").as("_unseen_b"))
    pairs
      .join(broadcast(ua), pairs(aCol) === ua("_unseen_a"), "left")
      .join(broadcast(ub), pairs(bCol) === ub("_unseen_b"), "left")
      .filter(col("_unseen_a").isNotNull || col("_unseen_b").isNotNull)
      .drop("_unseen_a", "_unseen_b")
  }
}
