package graft.streaming

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded bucket event: a document's membership in one pigeonhole
  * chunk bucket, carrying the full hash for in-bucket verification.
  */
final case class BucketEvent(chunk: Int, value: Long, doc_id: Long, simhash: Long)

/** Bounded per-bucket membership carried across micro-batches: the
  * `maxBucket` LOWEST doc ids seen in this bucket (same deterministic cap
  * rule as the batch path, so the retained set is independent of how the
  * stream is micro-batched).
  */
final case class BucketState(ids: Array[Long], hashes: Array[Long])

/** Emitted near-dup pair. */
final case class StreamPair(id_a: Long, id_b: Long, hamming: Int)

/** Streaming twins of the batch [[graft.operators.Dedup]] paths, for
  * continuous ingest (the batch operators assume the corpus is at rest;
  * a 100 TB/day pipeline also needs dedup AT THE DOOR). SimHash blocking
  * after Charikar (STOC 2002) via the pigeonhole chunking of Manku, Jain,
  * Das Sarma (WWW 2007) — same math as the batch path.
  *
  * - [[exactDedupStream]]: first occurrence per content fingerprint,
  *   composed from built-ins only (`dropDuplicates` over a watermarked
  *   stream — Spark's HDFS-backed dedup state, evicted by watermark, so
  *   state is bounded by the lateness horizon, not stream length).
  * - [[simHashNearDupStream]]: near-dup PAIRS over the stream via
  *   `flatMapGroupsWithState` keyed on the same (chunk, value) pigeonhole
  *   buckets as the batch path. State per bucket is the `maxBucket`
  *   lowest (id, hash) members — bounded like the batch cap, and the same
  *   lowest-matching-chunk rule makes emission exactly-once across
  *   buckets with NO cross-bucket distinct, which a streaming job could
  *   not express anyway (a distinct over all past pairs would be
  *   unbounded state).
  */
object StreamingDedup {

  /** First occurrence per exact content fingerprint. Pure composition:
    * md5 fingerprint column + `dropDuplicatesWithinWatermark` on the
    * watermarked stream. A plain `dropDuplicates("fp")` would never evict
    * (the event-time column is not part of the dedup key), so its state
    * grows with DISTINCT content forever; the within-watermark variant
    * expires each fingerprint's state one lateness horizon after it was
    * seen — bounded state, exact within the horizon, which is the usable
    * contract at 100 TB/day (cross-horizon dups are the batch job's job).
    */
  def exactDedupStream(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "10 minutes"
  ): DataFrame =
    stream
      .withColumn("fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Near-dup pairs over a document stream, SimHash pigeonhole blocking.
    *
    * Same math as [[graft.operators.Dedup.simHashNearDups]]: any pair
    * within Hamming ≤ maxHamming shares at least one of maxHamming+1
    * bit-chunks exactly, so each doc is exploded to its chunk buckets and
    * compared only against its bucket's members. Per-bucket state is the
    * `maxBucket` LOWEST ids (the batch cap rule — deterministic, so the
    * retained membership converges to the batch result no matter how the
    * stream is split into micro-batches). A pair is emitted when its
    * later member arrives, from its LOWEST matching chunk only (both full
    * hashes are in hand — recompute lower-chunk values and require no
    * match), so output needs no downstream dedup.
    *
    * Output mode: append (pairs are immutable facts). State: NoTimeout —
    * membership is evicted by the id cap, not time, mirroring the batch
    * semantics; swap in ProcessingTimeTimeout eviction for corpora where
    * old docs stop mattering.
    */
  def simHashNearDupStream(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 10000
  ): Dataset[StreamPair] = {
    import spark.implicits._
    require(
      maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming"
    )
    require(maxBucket > 1, "maxBucket must allow at least one pair")
    val chunks = maxHamming + 1
    val (widths, offsets) = (Dedup.chunkLayout(chunks)._1.toArray, Dedup.chunkLayout(chunks)._2.toArray)
    val masks = widths.map(Dedup.chunkMask)
    val exploded = docs
      .select(
        col(idCol).cast("long").as("_id"),
        Dedup.simHash(col(textCol)).as("_simhash")
      )
      .select(
        col("_id"),
        col("_simhash"),
        posexplode(
          array((0 until chunks).map { c =>
            shiftrightunsigned(col("_simhash"), offsets(c))
              .bitwiseAND(lit(masks(c)))
          }: _*)
        ).as(Seq("_chunk", "_val"))
      )
      .select(
        col("_chunk").as("chunk"),
        col("_val").as("value"),
        col("_id").as("doc_id"),
        col("_simhash").as("simhash")
      )
      .as[BucketEvent]
    exploded
      .groupByKey(e => (e.chunk, e.value))
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      )(updateBucket(maxHamming, maxBucket, widths, offsets))
  }

  /** Per-bucket state transition: verify each arriving member against the
    * retained membership, emit verified pairs whose lowest matching chunk
    * is THIS bucket's chunk, then fold the arrival into the capped
    * membership (keep the `maxBucket` lowest ids).
    *
    * Under an ACTIVE cap the streaming path mirrors the batch cap
    * exactly: pairs exist only among capped members — an arrival past
    * the cap emits nothing, because it leaves no trace in state and a
    * redelivery of it could not be deduplicated (exactly-once beats the
    * marginal recall). With the cap sized from the audit so it never
    * triggers (the d03 rule), stream output == batch output exactly.
    */
  private[streaming] def updateBucket(
      maxHamming: Int,
      maxBucket: Int,
      widths: Array[Int],
      offsets: Array[Int]
  )(
      key: (Int, Long),
      events: Iterator[BucketEvent],
      state: GroupState[BucketState]
  ): Iterator[StreamPair] = {
    val chunk = key._1
    def lowestMatchingChunkIs(c: Int, ha: Long, hb: Long): Boolean = {
      var i = 0
      while (i < c) {
        val va = (ha >>> offsets(i)) & Dedup.chunkMask(widths(i))
        val vb = (hb >>> offsets(i)) & Dedup.chunkMask(widths(i))
        if (va == vb) return false
        i += 1
      }
      true
    }
    val st = state.getOption.getOrElse(BucketState(Array.empty, Array.empty))
    // sort arrivals by id: emission and cap eviction are then independent
    // of arrival order within the batch (batch-parity determinism)
    val arrivals = events.toArray.sortBy(_.doc_id)
    val out = Array.newBuilder[StreamPair]
    var ids = st.ids
    var hashes = st.hashes
    arrivals.foreach { e =>
      // emit ONLY for arrivals that enter the capped membership: a
      // replayed id is already represented (re-verifying would emit its
      // pairs twice — at-least-once sources redeliver), and an arrival
      // past the cap leaves no trace in state, so a redelivery of it
      // could not be recognized either — emitting for it would break
      // exactly-once. This is also precisely the batch cap semantics:
      // pairs exist only among capped members.
      val p = java.util.Arrays.binarySearch(ids, e.doc_id)
      val pos = if (p >= 0) -1 else -(p + 1)
      if (pos >= 0 && pos < maxBucket) {
        var i = 0
        while (i < ids.length) {
          val ham = java.lang.Long.bitCount(hashes(i) ^ e.simhash)
          if (ham <= maxHamming && lowestMatchingChunkIs(chunk, hashes(i), e.simhash)) {
            val (a, b) =
              if (ids(i) < e.doc_id) (ids(i), e.doc_id) else (e.doc_id, ids(i))
            out += StreamPair(a, b, ham)
          }
          i += 1
        }
      }
      // fold into the capped membership: keep the maxBucket lowest ids
      if (pos >= 0 && pos < maxBucket) {
        val n = math.min(ids.length + 1, maxBucket)
        val newIds = new Array[Long](n)
        val newHashes = new Array[Long](n)
        System.arraycopy(ids, 0, newIds, 0, pos)
        System.arraycopy(hashes, 0, newHashes, 0, pos)
        newIds(pos) = e.doc_id
        newHashes(pos) = e.simhash
        val tail = n - pos - 1
        System.arraycopy(ids, pos, newIds, pos + 1, tail)
        System.arraycopy(hashes, pos, newHashes, pos + 1, tail)
        ids = newIds
        hashes = newHashes
      }
    }
    state.update(BucketState(ids, hashes))
    out.result().iterator
  }
}
