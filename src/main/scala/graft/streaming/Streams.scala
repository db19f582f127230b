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
}
