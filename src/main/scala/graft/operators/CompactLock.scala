package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory single-writer sentinel shared by BOTH persisted-index
  * layouts — the `_centroid`-partitioned ANN dirs
  * ([[Similarity.compactPartitionedDir]]) and the bucketed catalog
  * tables ([[Dedup.compactBucketedIndexTable]]). A compactor holds the
  * sentinel for its critical section; every append entry point fails
  * fast while it is present, because an append landing between the
  * compactor's snapshot read and its rename/metadata swap would be
  * silently DISCARDED by the swap.
  *
  * Acquisition is create-exclusive (`FileSystem.create(path,
  * overwrite=false)`): a second compactor never steals a LIVE
  * compactor's sentinel. A pre-existing sentinel is reclaimed only
  * when its recorded holder is provably not running here — the pid it
  * carries is not alive on this machine, is this very JVM with NO
  * in-flight compactor registered on the path (a leftover from a
  * failed attempt in-process: the failure path deliberately leaves the
  * sentinel behind, see [[releaseIfCanonical]]; a sentinel whose path
  * IS registered belongs to another live thread of this JVM and is
  * never stolen — [[inFlight]]), or the
  * sentinel is unreadable/unparsable (pre-upgrade format — fail open
  * to reclaim, matching the historical behavior those sentinels were
  * written under). The reclaim itself is an atomic rename of the stale
  * sentinel to a claimant-unique name, so when two compactors observe
  * the same dead holder exactly one wins the reclaim and the other
  * fails loudly (a delete-then-create reclaim would let the loser's
  * delete remove the winner's fresh sentinel). Liveness is
  * [[ProcessHandle]]-based, so the check
  * is meaningful only when compactors share a machine (or at least a
  * pid namespace); like the rest of the contract this is a fail-fast
  * guard against honest concurrent use on one filesystem, not a
  * distributed mutex — multi-driver deployments must serialize
  * compaction externally.
  *
  * Release is conditional: [[releaseIfCanonical]] deletes the sentinel
  * only when the canonical index (dir or table) exists at exit. On a
  * failure that left the canonical ABSENT — e.g. an exception between
  * the two swap renames, when the data lives only under
  * `_compact_old` — the sentinel stays behind, so appends keep failing
  * fast (an append would otherwise recreate the canonical location via
  * append-mode and the next compaction's target-exists recovery branch
  * would then DELETE `_compact_old`, losing all pre-compaction rows).
  * The next compact call reclaims the sentinel (dead-pid or same-pid
  * rule above) and its leftover recovery restores the canonical
  * layout. A failure that left the canonical intact (e.g. the rewrite
  * job itself failed) releases the sentinel normally — appends are
  * safe again immediately.
  */
private[graft] object CompactLock {

  /** JVM-local registry of sentinel paths held by LIVE in-process
    * compactors. The pid-liveness rule alone cannot distinguish "this
    * JVM's leftover from a failed attempt" (reclaimable) from "another
    * THREAD of this JVM is compacting right now" (stealing its
    * sentinel would let both proceed through the non-atomic
    * snapshot/rename swap) — both read as `holder == self`. A path is
    * registered for exactly the sentinel's critical section:
    * [[acquire]] adds it after the create that takes the lock,
    * [[releaseIfCanonical]] removes it unconditionally (even when the
    * sentinel file deliberately stays behind after a mid-swap failure,
    * the in-process compactor is finished — the next same-JVM attempt
    * must be able to reclaim).
    */
  private val inFlight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Sentinel path for a partitioned-dir layout (`<dir>_compact_lock`). */
  def forDir(dir: String): Path = new Path(dir + "_compact_lock")

  /** Sentinel path for a bucketed catalog table: a warehouse-sibling
    * file next to the table's default location
    * (`<warehouse>/<table>_compact_lock`). Keyed by the CANONICAL table
    * name, so it is stable across the compactor's rename-aside swap
    * (which moves the data directories, never this file) and visible to
    * any session sharing the warehouse.
    */
  def forTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Path =
    new Path(
      spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .toString + "_compact_lock")

  /** Per-sentinel-path monitors serializing same-JVM [[acquire]] calls.
    * Registration into [[inFlight]] necessarily happens some instant
    * AFTER the create-exclusive succeeds; without serialization a
    * sibling thread whose create failed inside that window would read
    * the set as empty, read the still-empty sentinel (holderPid None ⇒
    * fail-open), and reclaim a LIVE lock — two compactors in one JVM
    * (r15 advice). With the monitor, the create + register pair is
    * atomic relative to every same-JVM sibling: a sibling's acquire
    * can only observe "no sentinel" (before ours) or "sentinel +
    * registered" (after ours). [[releaseIfCanonical]] holds the SAME
    * monitor — its unregister + conditional-delete pair has the mirror
    * window (unregistered-but-sentinel-still-present reads as a
    * reclaimable leftover; a sibling could reclaim and then have its
    * fresh sentinel deleted by the releaser's delayed delete).
    * Cross-JVM holders were never exposed to either window — they are
    * covered by the pid-liveness rule. Entries are never evicted
    * (removal would let two threads hold DIFFERENT monitors for one
    * path, reopening the race); the map is bounded by the distinct
    * index paths a driver compacts, a handful per JVM life.
    */
  private val acquireMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def monitorFor(lock: Path): Object =
    acquireMonitors.computeIfAbsent(lock.toString, _ => new Object)

  /** Take the sentinel (create-exclusive; reclaim only per the
    * staleness rules in the object scaladoc). Throws
    * [[IllegalStateException]] when a LIVE foreign holder has it.
    */
  def acquire(fs: FileSystem, lock: Path): Unit =
    monitorFor(lock).synchronized(acquireSerialized(fs, lock))

  private def acquireSerialized(fs: FileSystem, lock: Path): Unit = {
    def create(): Unit = {
      val out = fs.create(lock, false)
      // register before the body write (the same-JVM window between the
      // create-exclusive and this add is CLOSED by the per-path monitor
      // above — siblings cannot run their failed-create reclaim check
      // inside it)
      inFlight.add(lock.toString)
      try {
        out.write(
          s"compaction started ${java.time.Instant.now()} pid ${ProcessHandle.current().pid()}\n"
            .getBytes("UTF-8"))
        out.close()
      } catch {
        case e: Throwable =>
          // the acquire failed — this thread holds nothing in-process
          // (the on-disk sentinel stays for the next attempt's reclaim)
          inFlight.remove(lock.toString)
          throw e
      }
      ()
    }
    try create()
    catch {
      case e: java.io.IOException =>
        // Only "sentinel already present" (create-exclusive refused) may
        // enter the reclaim path. Any other I/O failure — permissions, a
        // flaky mount — must surface as ITSELF: letting it through here
        // would end in a misleading "reclaimed by a concurrent
        // compactor" when the rename of the nonexistent sentinel fails.
        val present =
          e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
            (try fs.exists(lock)
            catch { case _: java.io.IOException => false })
        if (!present) throw e
        // decide whether the recorded holder is provably not a live
        // compactor (foreign pid, or another thread of THIS JVM) before
        // reclaiming
        if (inFlight.contains(lock.toString))
          throw new IllegalStateException(
            s"compaction sentinel $lock is held by another thread of this " +
              "JVM — refusing to steal a running compactor's lock; wait " +
              "for it to finish")
        val holder = holderPid(fs, lock)
        val self = ProcessHandle.current().pid()
        val liveForeign = holder.exists(p =>
          p != self && ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
        if (liveForeign)
          throw new IllegalStateException(
            s"compaction sentinel $lock is held by live pid ${holder.get} — " +
              "refusing to steal a running compactor's lock; wait for it to " +
              "finish (or remove the sentinel once that process is gone)")
        // Reclaim by ATOMIC RENAME, not delete+create: two reclaimers
        // that both observed the same dead holder would otherwise both
        // delete-then-create, the second delete removing the first's
        // FRESH sentinel — exactly the steal the create-exclusive path
        // prevents. Rename of the stale sentinel to a claimant-unique
        // name succeeds for exactly one process; the loser fails loudly.
        val claim = new Path(
          lock.toString + s".reclaim-$self-${java.util.UUID.randomUUID()}")
        if (!fs.rename(lock, claim))
          throw new IllegalStateException(
            s"compaction sentinel $lock was reclaimed by a concurrent " +
              "compactor while this one was acquiring — retry after it " +
              "finishes")
        fs.delete(claim, false)
        create()
    }
  }

  /** Best-effort pid recorded in the sentinel (None when unreadable or
    * unparsable — e.g. a pre-upgrade empty sentinel).
    */
  private def holderPid(fs: FileSystem, lock: Path): Option[Long] =
    try {
      val in = fs.open(lock)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "pid (\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    } catch { case _: Exception => None }

  /** Release the sentinel iff the canonical index survived (see object
    * scaladoc for why a canonical-absent failure must keep it).
    */
  def releaseIfCanonical(
      fs: FileSystem,
      lock: Path,
      canonicalPresent: => Boolean
  ): Unit = monitorFor(lock).synchronized {
    // the in-process critical section is over either way — only the
    // on-disk sentinel is conditional (see object scaladoc). The
    // unregister + delete pair runs under the SAME per-path monitor as
    // acquire: unserialized, a sibling's acquire could slip between
    // them (inFlight empty + holder==self ⇒ reclaim) and then lose its
    // FRESH sentinel to this delayed delete — two live compactors.
    inFlight.remove(lock.toString)
    if (canonicalPresent) { fs.delete(lock, false); () }
  }

  /** Fail fast when a compaction holds (or died holding) the sentinel:
    * an append that proceeded would be silently dropped by the
    * compactor's swap. Deliberately a pure existence check — a DEAD
    * compactor's sentinel still blocks appends (the safe direction)
    * until the next compact call reclaims it and recovers the layout.
    */
  def failIfHeld(fs: FileSystem, lock: Path, what: String): Unit =
    if (fs.exists(lock))
      throw new IllegalStateException(
        s"a compaction of $what is in progress (sentinel $lock present) — " +
          "appending now would be silently discarded by the compaction swap; " +
          "retry after it finishes, or delete the sentinel if the compactor " +
          "is known dead")
}
