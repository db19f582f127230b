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

  /** The events fixture schema with ts as raw nanos (see Tables.events
    * for the TIMESTAMP(NANOS) parquet caveat).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (read via nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Open the events fixture as a stream (file source replays the
    * parquet as one micro-batch; in production this is kafka/files).
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // the file stream source wants a directory; glob-filter to the fixture
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
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
