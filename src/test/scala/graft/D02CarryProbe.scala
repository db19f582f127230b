package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped scale probe (NEXT.md round-6 item 3): is d02's carried
  * lower-band array worth its shuffle bytes at candidate-heavy scale, vs
  * re-attaching band arrays by id in the pair join ("carry-nothing")?
  *
  * `sbt "Test/runMain graft.D02CarryProbe [replicas] [sfDir]"` builds the
  * replicated corpus (disjoint ids, per-replica text suffix so replicas
  * are near- not exact-dups), runs both variants uncapped, and prints
  * wall time + total shuffle-write bytes for each.
  *
  * Variant A = the library path ([[graft.operators.Dedup.minHashCandidates]]):
  * each member row carries the band hashes below its own band; the join
  * emits each pair from its lowest matching band directly.
  *
  * Variant B = carry-nothing: member rows are (band, bucket, id) only;
  * the self-join emits one row per SHARED band, and a (id → bands) table
  * (one row per doc) is re-attached to both sides to filter all but the
  * lowest matching band. Same output, different shuffle profile:
  * B's cap shuffle is ~28 bytes/row lighter, but its pair stream is
  * duplicated across shared bands and pays two extra joins.
  */
object D02CarryProbe {

  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = (0 until replicas)
      .map(r =>
        docs.select(
          (col("doc_id") + lit(r.toLong * 10_000_000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$r")).as("text")
        )
      )
      .reduce(_ unionByName _)
      .localCheckpoint(true)
    println(s"[d02probe] corpus rows=${corpus.count()} (replicas=$replicas)")

    def timed(name: String)(make: => DataFrame): Unit = {
      // settle the listener and isolate each variant's bytes
      Thread.sleep(500)
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      val df = make
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let stage-completed events drain
      println(
        f"[d02probe] $name pairs=$n t=$sec%.2f s shuffleMB=${shuffleBytes / 1e6}%.1f"
      )
      CacheUtil.release(df)
    }

    // ---- variant A: library path (carried lower-band arrays)
    timed("A-carried")(
      operators.Dedup.minHashCandidates(
        corpus, "text", "doc_id", maxBucket = Int.MaxValue)
    )

    // ---- variant B under corpus-scale join planning: at 100 TB the
    // (id → bands) table is corpus-sized and cannot broadcast, so the
    // re-attach is a shuffle join on both sides — measure that too
    def variantB(): DataFrame = {
      val numHashes = 32
      val bands = 8
      val shingleSize = 3
      val r = numHashes / bands
      val spread = corpus
        .select(col("doc_id").as("_id"), col("text").as("_text"))
        .repartition(spark.sparkContext.defaultParallelism)
      val withSig = spread.withColumn(
        "_sig",
        operators.Dedup.minHashSignature(col("_text"), numHashes, shingleSize)
      )
      val bandHashes = array((0 until bands).map { b =>
        xxhash64(slice(col("_sig"), b * r + 1, r), lit(b))
      }: _*)
      val banded = withSig.select(col("_id"), bandHashes.as("_bands"))
      // one row per doc: the table re-attached to both pair sides
      val bandsById = banded.localCheckpoint(true)
      val members = bandsById
        .select(col("_id"), posexplode(col("_bands")).as(Seq("_band", "_bucket")))
        .groupBy(col("_band"), col("_bucket"))
        .agg(collect_list(col("_id")).as("_ms"))
        .filter(size(col("_ms")) > 1)
        .select(col("_band"), col("_bucket"), explode(col("_ms")).as("_id"))
        .localCheckpoint(true)
      val dupPairs = members
        .as("a")
        .join(
          members.as("b"),
          col("a._band") === col("b._band") &&
            col("a._bucket") === col("b._bucket") &&
            col("a._id") < col("b._id")
        )
        .select(col("a._id").as("id_a"), col("b._id").as("id_b"), col("a._band").as("_band"))
      val noLower = (0 until bands - 1)
        .map(b => col("_band") <= lit(b) || col("ba._bands")(b) =!= col("bb._bands")(b))
        .reduce(_ && _)
      dupPairs
        .join(bandsById.as("ba"), col("id_a") === col("ba._id"))
        .join(bandsById.as("bb"), col("id_b") === col("bb._id"))
        .filter(noLower)
        .select(col("id_a"), col("id_b"))
    }

    timed("B-reattach")(variantB())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("B-reattach-noBroadcast")(variantB())

    spark.stop()
  }
}
