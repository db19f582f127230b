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

/** Real image decode output: dimensions, band count, and the sum of all
  * raster samples (the cheapest whole-image content witness — any
  * decode shortcut or codec corruption changes it).
  */
final case class DecodedImageRow(
    doc_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    pix_sum: Long
)

/** Real audio decode output: format metadata plus the sum of all signed
  * PCM samples (the cheapest whole-clip content witness — any decode
  * shortcut, endianness slip, or container corruption changes it).
  */
final case class DecodedAudioRow(
    doc_id: Long,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    sample_sum: Long
)

/** Real image resize output: input/output dimensions, the resized
  * raster's sample sum, and the re-encoded PNG (what a pipeline would
  * store; its byte length is codec-dependent, so only the dims and the
  * sample sum are oracle-compared).
  */
final case class ResizedImageRow(
    doc_id: Long,
    w_in: Int,
    h_in: Int,
    w_out: Int,
    h_out: Int,
    pix_sum: Long,
    png: Array[Byte]
)

/** Multimodal column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as batched per-partition transforms.
  *
  * IMAGE decode and resize are REAL since round 9 ([[decodeImages]] /
  * [[resizeImages]] run the JRE's `javax.imageio` PNG codec over the
  * payload and operate on the decoded raster), and AUDIO decode is REAL
  * since round 11 ([[decodeAudio]] parses WAV containers through
  * `javax.sound.sampled` and reconstructs the signed PCM samples). No
  * video codec ships with the JRE, so video payloads keep the byte-stat
  * stubs: the Spark-side plumbing is real and tested — schema (binary +
  * metadata), partition-local batched iteration (the shape a GPU or
  * native decoder needs) — with deterministic fake features so the
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
    * in for pixel/sample features. DEPRECATED alias since round 9 —
    * [[decodeImages]] runs the real PNG codec and [[decodeAudio]]
    * (round 11) the real WAV codec; this remains for VIDEO payloads
    * only (no video codec ships with the JRE).
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
    * storage win. DEPRECATED alias since round 9 — [[resizeImages]]
    * resizes real decoded rasters; this remains for opaque non-image
    * payloads.
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

  // ---- real image decode/resize (javax.imageio — public JRE API) -----
  //
  // The container has no image assets, so the FIXTURE is synthesized:
  // deterministic gray-8 PNGs whose dimensions and pixels are pure
  // functions of doc_id. The decode and resize below are REAL — they
  // run the actual PNG codec and operate on the decoded raster — and
  // the fixture's determinism is what lets DuckDB verify the decoded
  // metadata in closed form (PNG is lossless, so decoded samples equal
  // the written ones). The round-8 byte-stat stubs remain below as
  // deprecated aliases for the batched-iterator pipeline shape.

  /** Fixture dims/pixels for [[syntheticImageMedia]]: width `8 + id%9`
    * (8..16), height `8 + id%7` (8..14), gray sample at (x, y) =
    * `id%200 + x + y` — maximum 199 + 15 + 13 = 227 < 256, so no
    * modular wrap and every quantity has a closed form the oracle SQL
    * can state directly.
    */
  private[graft] def imageDims(id: Long): (Int, Int, Int) = {
    require(id >= 0, s"fixture ids must be non-negative, got $id")
    (8 + (id % 9).toInt, 8 + (id % 7).toInt, (id % 200).toInt)
  }

  /** Render one fixture image to PNG bytes. */
  private[graft] def renderPng(id: Long): Array[Byte] = {
    val (w, h, base) = imageDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, base + x + y); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG media fixture: one gray-8 image per document id,
    * encoded with the real PNG codec on the executors. Stands in for an
    * image corpus read via [[fromBinaryFiles]] on a real cluster.
    */
  def syntheticImageMedia(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map(id => MediaRow(id, "image/png", renderPng(id)))
      .toDF()
  }

  private def decodeOne(m: MediaRow): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.payload))
    require(img != null, s"payload of doc ${m.doc_id} is not a decodable image")
    img
  }

  private def sampleSum(img: java.awt.image.BufferedImage): Long = {
    val r = img.getRaster
    val (w, h, c) = (img.getWidth, img.getHeight, r.getNumBands)
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < c) { s += r.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    s
  }

  /** REAL image decode: run the JRE's codec over each binary payload and
    * emit (width, height, channels, sum of raster samples). Same
    * partition-local batched iterator as the stubs — the shape a
    * vectorized/GPU decoder would slot into — but the codec call is the
    * real one.
    */
  def decodeImages(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64
  ): Dataset[DecodedImageRow] = {
    import spark.implicits._
    batched(spark, media, batchSize) { m =>
      val img = decodeOne(m)
      DecodedImageRow(
        m.doc_id, img.getWidth, img.getHeight,
        img.getRaster.getNumBands, sampleSum(img))
    }
  }

  /** REAL image resize: decode, nearest-neighbor subsample the raster —
    * `out(x, y, b) = in(factor*x, factor*y, b)`, output dims
    * `ceil(in/factor)` — and re-encode as PNG. Nearest-neighbor is the
    * deterministic choice (Graphics2D interpolation varies by platform
    * and would break the oracle); the sampling rule is stated so the
    * closed-form fixture oracle can recompute the resized sample sum
    * exactly.
    */
  def resizeImages(
      spark: SparkSession,
      media: DataFrame,
      factor: Int = 2,
      batchSize: Int = 64
  ): Dataset[ResizedImageRow] = {
    import spark.implicits._
    require(factor >= 1, s"factor must be >= 1, got $factor")
    batched(spark, media, batchSize) { m =>
      val img = decodeOne(m)
      val (w, h) = (img.getWidth, img.getHeight)
      val c = img.getRaster.getNumBands
      val wOut = (w + factor - 1) / factor
      val hOut = (h + factor - 1) / factor
      val out = new java.awt.image.BufferedImage(wOut, hOut, img.getType match {
        // preserve gray/RGB family; exotic types fall back to RGB
        case java.awt.image.BufferedImage.TYPE_BYTE_GRAY =>
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        case t if t != java.awt.image.BufferedImage.TYPE_CUSTOM => t
        case _ => java.awt.image.BufferedImage.TYPE_INT_RGB
      })
      val src = img.getRaster
      val dst = out.getRaster
      val bands = math.min(c, dst.getNumBands)
      var y = 0
      while (y < hOut) {
        var x = 0
        while (x < wOut) {
          var b = 0
          while (b < bands) {
            dst.setSample(x, y, b, src.getSample(x * factor, y * factor, b))
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      ResizedImageRow(
        m.doc_id, w, h, wOut, hOut, sampleSum(out), bos.toByteArray)
    }
  }

  // ---- real audio decode (javax.sound.sampled — public JRE API) ------
  //
  // The container has no audio assets, so the FIXTURE is synthesized:
  // deterministic 16-bit little-endian PCM WAVs (mono or stereo by id)
  // whose every sample is a pure function of doc_id. The decode below
  // is REAL — it parses the RIFF/fmt/data chunks through the JRE's WAV
  // codec and reconstructs the signed samples — and because PCM WAV is
  // lossless, the decoded sample sum equals the written one, which the
  // oracle states in closed form. A payload passthrough cannot fake
  // (sample_rate, channels, n_frames, sample_sum) without actually
  // decoding. Video payloads remain on the byte-stat aliases (no video
  // codec ships with the JRE).

  /** Fixture params for [[syntheticAudioMedia]]: channels `1 + id%2`
    * (mono/stereo), frames `100 + id%50`, sample at (frame i, channel
    * ch) = `id%1000 + 3*i + ch` — maximum 999 + 3*149 + 1 = 1447, far
    * inside 16-bit signed range, so every quantity has a closed form.
    */
  private[graft] def audioParams(id: Long): (Int, Int, Int) = {
    require(id >= 0, s"fixture ids must be non-negative, got $id")
    (1 + (id % 2).toInt, 100 + (id % 50).toInt, (id % 1000).toInt)
  }

  /** Render one fixture clip as a WAV file (RIFF container, 16-bit LE
    * signed PCM at 8 kHz) through the real `javax.sound.sampled` writer.
    */
  private[graft] def renderWav(id: Long): Array[Byte] = {
    val (c, n, base) = audioParams(id)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, c, true, false)
    val pcm = new Array[Byte](n * c * 2)
    var off = 0
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < c) {
        val v = base + 3 * i + ch
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        off += 2
        ch += 1
      }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem
      .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic WAV media fixture: one PCM clip per document id,
    * encoded with the real WAV writer on the executors. Stands in for an
    * audio corpus read via [[fromBinaryFiles]] on a real cluster.
    */
  def syntheticAudioMedia(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map(id => MediaRow(id, "audio/wav", renderWav(id)))
      .toDF()
  }

  /** REAL audio decode: run the JRE's WAV codec over each binary payload
    * and emit (sample_rate, channels, n_frames, sum of signed samples).
    * Same partition-local batched iterator as [[decodeImages]] — the
    * shape a native/GPU audio frontend would slot into — with the
    * actual codec call.
    */
  def decodeAudio(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64
  ): Dataset[DecodedAudioRow] = {
    import spark.implicits._
    batched(spark, media, batchSize) { m =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val f = ais.getFormat
      require(
        f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian,
        s"doc ${m.doc_id}: expected 16-bit LE signed PCM, got $f")
      val data = ais.readAllBytes()
      val c = f.getChannels
      val frames = data.length.toLong / (2L * c)
      var s = 0L
      var off = 0
      while (off + 1 < data.length) {
        // 16-bit LE signed: high byte sign-extends through the Int shift
        s += ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
        off += 2
      }
      DecodedAudioRow(m.doc_id, f.getSampleRate.toInt, c, frames, s)
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
