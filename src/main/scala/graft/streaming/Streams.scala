package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same event-time shapes as
  * [[EventOps]], run incrementally with watermarks. Batch and stream
  * share semantics — the ScalaTest suite asserts stream output ==
  * batch output on the same fixture.
  */
object Streams {

  /** The events fixture schema, ts-type-agnostic: the concrete ts type is
    * substituted per fixture generation in [[eventStream]] (see
    * Tables.events for the TIMESTAMP(NANOS) vs TIMESTAMP(MICROS) caveat).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // placeholder; replaced by footer type
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Open the events fixture as a stream (file source replays the
    * parquet as one micro-batch; in production this is kafka/files).
    *
    * Mirrors Tables.events' dual-generation dispatch: the fixture's ts
    * column has shipped both as nanos-LONG (TIMESTAMP(NANOS) under
    * nanosAsLong) and as TIMESTAMP(MICROS). A streaming source needs a
    * user-supplied schema, so we probe the parquet footer once with a
    * batch read (metadata-only, no scan) and build the streaming schema
    * + normalization for whichever generation is on disk. Normalizing at
    * the source keeps every downstream watermark/window/session shape
    * identical to batch.
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val schema = StructType(rawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f                   => f
    })
    // the file stream source wants a directory; glob-filter to the fixture
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType =>
        // nanos generation: integer `div` (see Tables.events for why not `/`)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling-window counts with a watermark: the streaming form of
    * EventOps.tumblingAgg. Late data beyond `watermark` is dropped and
    * state is bounded — the property that matters at 100 TB/day.
    */
  def windowedCounts(
      stream: DataFrame,
      width: String = "5 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Block until the query is FULLY settled: all source data processed
    * AND every trailing no-data batch committed. `processAllAvailable`
    * only promises the former — but watermark-driven state eviction
    * (outer-join null emissions, late-window closes) runs in a no-data
    * batch AFTER the last data batch, which the engine schedules on its
    * own trigger loop (measured on the st14 fixture: the unmatched-left
    * rows never appeared behind a bare processAllAvailable). Polls
    * (batchId, watermark) until unchanged across two consecutive
    * settle windows; the watermark only moves on data, so the engine
    * runs at most finitely many trailing no-data batches and this
    * terminates. `maxWaitMs` bounds a wedged query loudly.
    *
    * A reading only counts as stable when NO trigger is active:
    * `lastProgress` updates at batch COMPLETION, so without the
    * `isTriggerActive` guard two polls could both read the previous
    * batch's progress while a long eviction batch (big state store, GC
    * pause) is still mid-flight — and drain would return before its
    * output reached the sink.
    *
    * `untilWatermark`: reading-stability alone can return EARLY — Spark
    * throttles progress updates for no-data batches
    * (spark.sql.streaming.noDataProgressEventInterval, default 10 s), so
    * under load the trailing eviction batch may not have STARTED when two
    * quiet settle windows elapse. A caller that knows the watermark its
    * sentinels imply (st14/st16: sentinel ts − watermark delay) passes it
    * here, and stability only counts once the reported watermark has
    * reached it — the eviction batch that advances the watermark past the
    * threshold must then have committed (progress surfaces within the
    * no-data reporting interval, well inside `maxWaitMs`). Callers with
    * no sentinel-implied threshold keep the stability-only behavior.
    */
  def drain(
      q: StreamingQuery,
      settleMs: Long = 250L,
      maxWaitMs: Long = 60000L,
      untilWatermark: Option[java.sql.Timestamp] = None
  ): Unit = {
    q.processAllAvailable()
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var last: (Long, String) = (-1L, "")
    var stable = 0
    def wmReached(wm: String): Boolean = untilWatermark.forall { t =>
      try java.time.Instant.parse(wm).toEpochMilli >= t.getTime
      catch { case _: RuntimeException => false } // "null"/absent/unparsed
    }
    while (stable < 2) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"drain: query did not settle within ${maxWaitMs} ms (at $last" +
            untilWatermark.fold("")(t => s", awaiting watermark >= $t") + ")")
      Thread.sleep(settleMs)
      q.processAllAvailable()
      val cur = Option(q.lastProgress)
        .map(p => (p.batchId, String.valueOf(p.eventTime.get("watermark"))))
        .getOrElse((-2L, ""))
      if (cur == last && !q.status.isTriggerActive && wmReached(cur._2))
        stable += 1
      else { stable = 0; last = cur }
    }
  }

  /** Run a streaming DataFrame to a named in-memory table and block
    * until the file source is drained (local smoke path).
    */
  def runToMemory(
      df: DataFrame,
      name: String,
      outputMode: String = "complete"
  ): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }

  /** Materialize `df` as `n` EVENT-TIME-ORDERED parquet files in a fresh
    * `dir` (chunk k = the k-th `tsCol` quantile slice, one file each,
    * modification times strictly ascending with k), so a file-source
    * stream with `maxFilesPerTrigger=1` replays it as `n` micro-batches
    * whose event time advances monotonically — the arrival order real
    * ingest has and the order watermarks assume. An id-keyed split (the
    * %3 fixture convention of the fold rows) would interleave event
    * times across batches and make the watermark drop "late" rows that
    * a production stream would never see late. Returns the chunk
    * schema for the caller's `readStream.schema(...)`.
    *
    * Fixture-scale helper (each chunk is coalesced to ONE file — the
    * point is deterministic micro-batch boundaries, not write
    * throughput); production streams read from a real source.
    */
  def writeTsOrderedChunks(
      df: DataFrame,
      tsCol: String,
      dir: String,
      n: Int = 3,
      finalChunks: Seq[DataFrame] = Nil
  ): org.apache.spark.sql.types.StructType = {
    // fail the n < 2 contract here, not in the percentile expression
    // below (an empty quantile array dies in analysis with no hint)
    require(n >= 2, "need at least two chunks to exercise cross-batch state")
    // exact interpolated percentiles of the event time — deterministic
    // boundaries for a given fixture. `finalChunks` (if any) are written
    // as EXTRA trailing micro-batches and do NOT move the quantile
    // boundaries of the real data — the watermark-advancing-sentinel
    // shape outer joins need (an unmatched row's null emission only
    // fires once the watermark passes its eviction point, which the
    // last REAL batch can never trigger for its own rows; the eviction
    // then runs in a trailing no-data batch, awaited via [[drain]]).
    // The caller must keep each chunk's event times above the previous
    // chunk's maximum or the ordered-chunks property breaks.
    val qs = (1 until n).map(_.toDouble / n)
    val bounds = df
      .select(expr(
        s"percentile(unix_micros($tsCol), array(${qs.mkString(",")}))"))
      .head.getSeq[Double](0).map(_.toLong)
    val micros = unix_micros(col(tsCol))
    writeOrderedChunkFiles(df, dir, n + finalChunks.size) { k =>
      if (k >= n) finalChunks(k - n)
      else {
        val lo = if (k == 0) None else Some(bounds(k - 1))
        val hi = if (k == n - 1) None else Some(bounds(k))
        df.filter(lo.map(micros >= lit(_)).getOrElse(lit(true)))
          .filter(hi.map(micros < lit(_)).getOrElse(lit(true)))
      }
    }
  }

  /** [[writeTsOrderedChunks]]'s sibling for keyless (no event time)
    * fixtures: chunk k = rows with `idCol % n == k` — the %3 split the
    * fold rows use — arrival order still pinned by modification time.
    * Numeric ids only (the fixture convention); event-time tables
    * should use the ts-ordered form so watermark semantics hold.
    */
  def writeIdModChunks(
      df: DataFrame,
      idCol: String,
      dir: String,
      n: Int = 3
  ): org.apache.spark.sql.types.StructType =
    writeOrderedChunkFiles(df, dir, n)(k => df.filter(pmod(col(idCol), lit(n)) === k))

  /** Shared chunk-file plumbing: a fresh `dir` of `n` one-file parquet
    * chunks with strictly ascending modification times, so a file
    * source with `maxFilesPerTrigger=1` replays chunk k as micro-batch
    * k deterministically.
    */
  private def writeOrderedChunkFiles(
      df: DataFrame,
      dir: String,
      n: Int
  )(chunk: Int => DataFrame): org.apache.spark.sql.types.StructType = {
    require(n >= 2, "need at least two chunks to exercise cross-batch state")
    // java.nio directory streams hold an open descriptor until closed —
    // consume them through this closing wrapper (the helper runs three
    // times per bench pass; leaked descriptors accumulate per JVM)
    def walkAll(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(p)
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toList }
      finally s.close()
    }
    def deleteTree(p: java.nio.file.Path): Unit =
      walkAll(p).reverse.foreach(java.nio.file.Files.delete)
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) deleteTree(root)
    java.nio.file.Files.createDirectories(root)
    (0 until n).foreach { k =>
      val tmp = s"$dir/.chunk_$k"
      chunk(k).coalesce(1).write.parquet(tmp)
      val partFile = walkAll(java.nio.file.Paths.get(tmp))
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(
          throw new IllegalStateException(s"no parquet file written for chunk $k"))
      val dest = root.resolve(f"chunk-$k%03d.parquet")
      java.nio.file.Files.move(partFile, dest)
      // the file source orders same-listing files by modification time —
      // pin it explicitly so chunk order never depends on write latency
      java.nio.file.Files.setLastModifiedTime(
        dest, java.nio.file.attribute.FileTime.fromMillis(1000L * (k + 1)))
      deleteTree(java.nio.file.Paths.get(tmp))
    }
    df.schema
  }

  /** Watermarked STREAM-STREAM interval join (the Structured Streaming
    * state-store join, not a broadcast of a static side): each left
    * event is matched to same-key right events whose event time falls
    * in `[left.ts - window, left.ts]`. Both sides carry a `watermark`
    * delay; Spark derives the state retention bound from the interval
    * condition, so right-side state is evicted once no future left row
    * (by the watermark) can reach back to it — bounded state at
    * 100 TB/day, the property a raw self-join lacks. Append-mode
    * output: each matched pair emits exactly once.
    *
    * Parity contract (gated stream == batch in StreamingSpec): with
    * event-time-ordered micro-batches ([[writeTsOrderedChunks]]) and
    * `watermark >= window`, no row is ever late and no state a future
    * batch needs is evicted, so the append stream equals the batch
    * interval join row-for-row.
    *
    * `joinType = "left_outer"` adds the unmatched-left emission — the
    * "error with NO click in the trailing hour" shape attribution and
    * funnel pipelines need, which the inner join cannot express. A left
    * row's null-padded result emits ONCE, when the watermark proves no
    * future right row can reach back to it (right events matching a
    * left row at time T all have ts ≤ T, so T < watermark suffices) —
    * i.e. at eviction, not at arrival. `"full_outer"` adds the
    * unmatched-RIGHT emission too, whose eviction frontier is LATER: a
    * right row at time T can still be matched by a left row up to
    * T + window, so its null emission needs watermark > T + window —
    * size the sentinel lead (and any [[drain]] threshold) off the
    * right frontier, not the left one. Parity corollary: the last real
    * batch can never trigger its OWN rows' null emissions (the
    * watermark only advances past them on a LATER batch), so a finite
    * fixture needs a trailing watermark-advancing sentinel batch on
    * BOTH sides ([[writeTsOrderedChunks]]'s `finalChunks` — the global
    * watermark is the MIN across both stream sides) and the run must be
    * awaited with [[drain]] (the eviction lands in a trailing no-data
    * batch); an unbounded production stream advances naturally. Two
    * pushdown traps, both measured: a row filter added to the streaming
    * query is predicate-pushed through the join and the watermark node
    * to the scan (it will delete a sentinel before it advances
    * anything — filter the post-sink batch table instead), and a
    * sentinel pair must not key-match each other or they become join
    * rows.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      window: String = "1 hour",
      watermark: String = "2 hours",
      joinType: String = "inner"
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right
      .withColumnRenamed(key, s"_r_$key")
      .withWatermark(rightTs, watermark).as("r")
    l.join(
      r,
      col(s"l.$key") === col(s"r._r_$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $window") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"),
      joinType)
  }
}
