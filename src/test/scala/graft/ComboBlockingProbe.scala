package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped scale probe: where does Manku combination blocking
  * ([[graft.operators.Dedup.simHashNearDupsCombination]], h=3/b=6, 20
  * probes of ~32-bit keys) overtake pigeonhole chunk blocking
  * ([[graft.operators.Dedup.simHashNearDups]], h=3, 4 probes of 16-bit
  * keys)? Pigeonhole's random-collision candidate mass is ≈ n²/2¹⁵,
  * combination's ≈ 20·n²/2³³ — a 2¹⁸·⁴× smaller constant on the same
  * quadratic. The TPC-H-ish documents fixture cannot reach that regime:
  * its narrow generator vocabulary makes it dup-dense at h=3 (hundreds
  * of thousands of TRUE pairs at 5 k docs), so both blockings are
  * output-bound there and the 4-probe form wins on constant factors —
  * which is precisely why the library keeps BOTH and documents the
  * crossover.
  *
  * `sbt "Test/runMain graft.ComboBlockingProbe [nDocs]"` builds a
  * SPARSE corpus instead — every doc gets 30 tokens unique to its id
  * (disjoint token sets → independent simhashes → candidates are pure
  * random collisions) — plus 500 planted near-copy pairs (3 of 30
  * tokens changed) to prove recall inside the same run. Both legs run
  * uncapped, must emit the identical pair set, and print wall time,
  * random-collision candidate mass, and shuffle bytes.
  *
  * Measured on this box (local[16], min-of-1), identical pair sets at
  * every point:
  *
  *   nDocs | mass pigeon | mass combo | ratio | t pigeon | t combo
  *     1 M |      42.5 M |      5,040 | 8423× |   8.4 s  |  11.1 s
  *     4 M |     679.6 M |     79,115 | 8590× |  21.2 s  |  48.0 s
  *    10 M |     4.25 G  |    493,162 | 8612× |  87.7 s  | 156.0 s
  *
  * Reading: the mass ratio is the constant 2^18.4 predicted by theory;
  * wall time still favors pigeonhole here because the codegen'd verify
  * burns noise candidates at ~50 M pairs/s while combination pays a 5×
  * probe-row shuffle (~40× more per row than a verify). Equating the
  * two cost models puts the wall-clock crossover at ~20 M docs on this
  * hardware ratio; past it pigeonhole grows as n²/2¹⁵ while combination
  * stays effectively linear — at 10⁹ docs (the design target) the
  * pigeonhole verify alone is 3×10¹³ operations vs combination's
  * 2×10⁹. Use pigeonhole below ~10⁷ docs, combination above.
  */
object ComboBlockingProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 1_000_000
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    // sparse corpus: doc i = tokens t<i>_0 .. t<i>_29 (disjoint across
    // docs); planted near-copies: doc 10^9+i replaces 3 of doc i's 30
    // tokens (i < 500) — simhash moves a few bits, staying within h=3
    // with high probability while every other pair is random-distance
    def tokenArray(idCol: org.apache.spark.sql.Column, changed: Int) =
      array_join(
        transform(
          sequence(lit(0), lit(29)),
          j => when(j < lit(changed), concat(lit("alt"), idCol, lit("_"), j))
            .otherwise(concat(lit("t"), idCol, lit("_"), j))
        ),
        " "
      )
    val base = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), tokenArray(col("id"), 0).as("text"))
    val planted = spark.range(500)
      .select(
        (col("id") + 1_000_000_000L).as("doc_id"),
        tokenArray(col("id"), 3).as("text")
      )
    val corpus = base.unionByName(planted).localCheckpoint(true)
    println(s"[comboprobe] corpus rows=${corpus.count()} (sparse, 500 planted near-pairs)")

    def candidateMass(audit: DataFrame): Long =
      audit
        .agg(sum((col("bucket_size") * (col("bucket_size") - 1) / 2).cast("long")))
        .collect()(0)
        .getLong(0)

    val h = 3
    val pigeonMass = candidateMass(
      Dedup.hotSimHashBuckets(corpus, "text", "doc_id", maxHamming = h, maxBucket = 1))
    val comboMass = candidateMass(
      Dedup.hotSimHashComboBuckets(
        corpus, "text", "doc_id", maxHamming = h, blocks = 6, maxBucket = 1))
    println(f"[comboprobe] candidate mass: pigeonhole=$pigeonMass%,d combination=$comboMass%,d (${pigeonMass.toDouble / math.max(comboMass, 1)}%.0fx)")

    def timed(name: String)(make: => DataFrame): Set[(Long, Long)] = {
      Thread.sleep(500)
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      val df = make
      val pairs = df
        .select("id_a", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val sec = (System.nanoTime() - t0) / 1e9
      graft.CacheUtil.release(df)
      println(f"[comboprobe] $name%-12s ${sec}%8.2f s  pairs=${pairs.size}%,d  shuffleMB=${shuffleBytes / 1e6}%,.1f")
      pairs
    }

    val uncapped = Int.MaxValue
    val pigeon = timed("pigeonhole")(
      Dedup.simHashNearDups(corpus, "text", "doc_id", maxHamming = h, maxBucket = uncapped))
    val combo = timed("combination")(
      Dedup.simHashNearDupsCombination(
        corpus, "text", "doc_id", maxHamming = h, blocks = 6, maxBucket = uncapped))
    require(pigeon == combo, s"pair sets differ: ${pigeon.size} vs ${combo.size}")
    println(s"[comboprobe] pair sets identical (${pigeon.size} pairs) — recall parity holds")
    spark.stop()
  }
}
