package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

/** Decoder output: deterministic features per asset. */
final case class DecodedRow(
    doc_id: Long,
    n_bytes: Int,
    checksum: Long,
    features: Array[Double]
)

/** Resize output: decimated payload + size metadata. */
final case class ResizedRow(
    doc_id: Long,
    n_orig: Int,
    n_resized: Int,
    resized: Array[Byte]
)

/** Multimodal column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as batched per-partition transforms.
  *
  * The decode step is a STUB — the real image/audio codecs are not in this
  * container — but the Spark-side plumbing is real and tested: schema
  * (binary + metadata), partition-local batched iteration (the shape a GPU
  * or native decoder needs), and deterministic fake features so the
  * pipeline is verifiable end-to-end.
  */
object Multimodal {

  /** Wrap a text corpus as media rows: payload = utf-8 bytes. Stands in
    * for `spark.read.format("binaryFile")` assets in this container.
    */
  def toMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text").as("kind"),
      col(textCol).cast("binary").as("payload")
    )

  /** Real ingestion entry point: read a directory of binary assets via
    * Spark's `binaryFile` source — the scan a 100 TB image/audio corpus
    * starts from (it distributes by file, carries (path, length,
    * modificationTime, content), and prunes on path filters). Returns the
    * file-level frame; [[mediaFromBinaryFiles]] adapts it to the media
    * schema the decode/resize/frame operators consume.
    */
  def fromBinaryFiles(
      spark: SparkSession,
      dir: String,
      kind: String = "bin"
  ): DataFrame =
    spark.read
      .format("binaryFile")
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        lit(kind).as("kind"),
        col("content").as("payload"),
        col("length").cast("long").as("n_bytes"),
        col("modificationTime").as("mod_time")
      )

  /** [[fromBinaryFiles]] adapted to the (doc_id, kind, payload) media
    * schema: the numeric prefix of each file name becomes the id (the
    * layout [[writeTextCorpusAsFiles]] produces). Files without a numeric
    * prefix are rejected loudly rather than silently dropped.
    */
  def mediaFromBinaryFiles(
      spark: SparkSession,
      dir: String,
      kind: String = "bin"
  ): DataFrame = {
    val idFromName = regexp_extract(col("name"), "^(\\d+)", 1)
    fromBinaryFiles(spark, dir, kind)
      .select(
        // two loud-rejection cases: no numeric prefix at all, and a
        // prefix that overflows Long (cast would yield a silent NULL
        // doc_id that breaks downstream joins). 19 digits can still
        // exceed Long.MaxValue, so the >18 check over-rejects a sliver
        // of the valid range — ids that large indicate a broken writer
        // anyway. Leading-zero prefixes ("007" vs "7") collide by
        // design: the id space is owned by writeTextCorpusAsFiles,
        // which never zero-pads.
        when(
          idFromName === "",
          raise_error(concat(lit("file name has no numeric id prefix: "), col("name")))
        ).when(
            length(idFromName) > 18,
            raise_error(concat(lit("numeric id prefix overflows long: "), col("name")))
          )
          .otherwise(idFromName.cast("long"))
          .as("doc_id"),
        col("kind"),
        col("payload")
      )
  }

  /** Fixture generator: write each doc's text bytes as `<doc_id>.bin`
    * under `dir` (one file per row, written from the executors). LOCAL
    * testing aid for the binaryFile ingestion path — in this container
    * there are no real image/audio assets, so the corpus stands in. On a
    * real cluster point [[fromBinaryFiles]] at the actual asset store
    * instead.
    */
  def writeTextCorpusAsFiles(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String
  ): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    fs.mkdirs(path)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        )
        ()
      }
  }

  /** Binary metadata projection — pure column expressions over the blob. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("kind"),
      length(col("payload")).as("n_bytes"),
      substring(col("payload"), 1, 4).as("magic")
    )

  /** Partition-local batched iteration over media rows — the shape a real
    * vectorized decoder/resizer (or Arrow bridge) consumes: `f` sees each
    * row, but rows arrive grouped so a native implementation can process
    * a whole batch in one call. Shared by every *Stub transform.
    */
  private def batched[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int
  )(f: MediaRow => T): Dataset[T] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real implementation would process `batch` as ONE call
          batch.iterator.map(f)
        }
      }
  }

  /** Batched decode: partition-local, batches of `batchSize` rows — the
    * iterator shape a real vectorized decoder (or Arrow/pandas bridge)
    * consumes. STUB: features are deterministic byte statistics standing
    * in for pixel/sample features.
    */
  def decodeStub(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64
  ): Dataset[DecodedRow] = {
    import spark.implicits._
    batched(spark, media, batchSize) { m =>
      val bytes = m.payload
      // shared kernel with the text fingerprint (ASCII payload ⇒
      // byte loop == code-point loop)
      val h = graft.functions.HashExpressionImpls.rollingHashBytes(bytes)
      DecodedRow(
        m.doc_id,
        bytes.length,
        h,
        Array(bytes.length.toDouble, (h % 256).toDouble)
      )
    }
  }

  /** Batched resize: keep every `factor`-th byte of the payload — the
    * deterministic stand-in for spatial downsampling (a real resize is a
    * native/GPU call on the decoded pixels; the Spark-side shape is the
    * same partition-local batched iterator as [[decodeStub]]). Output
    * carries the original and resized sizes, so a pipeline can assert its
    * storage win.
    */
  def resizeStub(
      spark: SparkSession,
      media: DataFrame,
      factor: Int,
      batchSize: Int = 64
  ): Dataset[ResizedRow] = {
    import spark.implicits._
    require(factor >= 1, s"factor must be >= 1, got $factor")
    batched(spark, media, batchSize) { m =>
      val bytes = m.payload
      // ceil without the (len + factor - 1) form: that sum overflows Int
      // for factor near Int.MaxValue and would size a negative array
      val n = bytes.length / factor + (if (bytes.length % factor == 0) 0 else 1)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = bytes(i * factor)
        i += 1
      }
      ResizedRow(m.doc_id, bytes.length, n, out)
    }
  }

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every `every`-th — the video-keyframe access pattern, expressed as a
    * pure column transform (no decode needed for the slicing itself).
    */
  def frameSample(
      media: DataFrame,
      frameBytes: Int,
      every: Int
  ): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
    // empty payload ⇒ zero frames; the sequence() path can't express that
    // (sequence(0, -1) yields a DESCENDING [0, -1], not []), so guard it
    val frames = when(nFrames === 0, array().cast("array<binary>"))
      .otherwise(
        transform(
          sequence(lit(0), (nFrames - 1).cast("int")),
          i => substring(col("payload"), lit(1) + i * frameBytes, lit(frameBytes))
        )
      )
    media.select(
      col("doc_id"),
      frames.as("frames"),
      nFrames.cast("int").as("n_frames")
    ).select(
      col("doc_id"),
      filter(col("frames"), (_, i) => i % every === 0).as("sampled_frames"),
      col("n_frames")
    )
  }
}
