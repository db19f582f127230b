package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

/** Real video decode output: container metadata (the stream's fourcc and
  * frame dimensions from the AVI headers) plus the sum of all decoded
  * raster samples across every frame — the cheapest whole-clip content
  * witness (a frame-split shortcut, codec corruption, or a skipped
  * frame changes it).
  */
final case class DecodedVideoRow(
    doc_id: Long,
    fourcc: String,
    width: Int,
    height: Int,
    n_frames: Int,
    pix_sum: Long
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
  * payload and operate on the decoded raster), AUDIO decode is REAL
  * since round 11 ([[decodeAudio]] parses WAV containers through
  * `javax.sound.sampled` and reconstructs the signed PCM samples), and
  * VIDEO decode is REAL since round 13: [[decodeVideo]] walks the RIFF
  * AVI container (headers, stream list, `movi` frame chunks — the
  * public Microsoft RIFF/AVI layout) and decodes every frame through
  * `javax.imageio` — Motion-PNG (`MPNG` fourcc) losslessly for the
  * closed-form oracle, Motion-JPEG (`MJPG`) through the JRE's JPEG
  * codec (lossy, so gated on dims/frame-count rather than sample sums).
  * The round-8 byte-stat stubs are gone — every modality decodes for
  * real.
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
    * a whole batch in one call. Shared by every decode/resize transform.
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

  // ---- real image decode/resize (javax.imageio — public JRE API) -----
  //
  // The container has no image assets, so the FIXTURE is synthesized:
  // deterministic gray-8 PNGs whose dimensions and pixels are pure
  // functions of doc_id. The decode and resize below are REAL — they
  // run the actual PNG codec and operate on the decoded raster — and
  // the fixture's determinism is what lets DuckDB verify the decoded
  // metadata in closed form (PNG is lossless, so decoded samples equal
  // the written ones).

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
  // decoding.

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

  // ---- real video decode (RIFF/AVI container + javax.imageio) --------
  //
  // The container has no video assets and no video codec ships with the
  // JRE — but a CONTAINER parser and a per-frame image codec do not need
  // one: the AVI layout (RIFF 'AVI ' → LIST hdrl{avih, LIST strl{strh,
  // strf}} → LIST movi{##dc frame chunks} → idx1) is the public
  // Microsoft RIFF spec, and Motion-JPEG/Motion-PNG store each frame as
  // a self-contained still that `javax.imageio` decodes. The fixture is
  // Motion-PNG (`MPNG` fourcc, a registered AVI handler): PNG is
  // lossless, so every decoded sample equals the written one and the
  // whole-clip sample sum has a closed form the oracle SQL states
  // directly. The SAME parser + decode path handles `MJPG` (gated in
  // ScalaTest on dims/frame count — JPEG decode is deterministic per
  // JVM but not closed-form). Writer and parser are both ours, but the
  // parser is NOT a private round-trip hack: it rejects non-RIFF bytes,
  // checks the declared stream type/dims against the decoded frames,
  // and reads fourccs/dims from the header chunks it walks.

  /** Fixture params for [[syntheticVideoMedia]]: width `8 + id%9`
    * (8..16), height `8 + id%7` (8..14), frames `2 + id%4` (2..5), gray
    * sample of frame f at (x, y) = `id%150 + x + y + 7*f` — maximum
    * 149 + 15 + 13 + 21 = 198 < 256, so no modular wrap and the
    * whole-clip sample sum has the closed form
    * `n*(w*h*base + h*w(w-1)/2 + w*h(h-1)/2) + 7*w*h*n(n-1)/2`.
    */
  private[graft] def videoParams(id: Long): (Int, Int, Int, Int) = {
    require(id >= 0, s"fixture ids must be non-negative, got $id")
    (8 + (id % 9).toInt, 8 + (id % 7).toInt, 2 + (id % 4).toInt, (id % 150).toInt)
  }

  /** Render fixture frame `f` of clip `id` to PNG bytes. */
  private[graft] def renderVideoFrame(id: Long, f: Int): Array[Byte] = {
    val (w, h, _, base) = videoParams(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, base + x + y + 7 * f); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def putU16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def putU32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
    b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
  }
  private def putFcc(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    b.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }
  /** One RIFF chunk: id + u32 size + payload (+ pad byte to word-align —
    * the RIFF rule every real demuxer depends on).
    */
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    putFcc(b, id); putU32(b, payload.length.toLong); b.write(payload)
    if ((payload.length & 1) == 1) b.write(0)
    b.toByteArray
  }
  private def riffList(kind: String, children: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    putFcc(b, "LIST"); putU32(b, (4 + children.length).toLong)
    putFcc(b, kind); b.write(children)
    b.toByteArray
  }

  /** Mux pre-encoded frames into a minimal-but-valid AVI: avih + one
    * 'vids' stream (strh/strf carrying `fourcc` and the dims) + a movi
    * list of '00dc' chunks + a keyframe idx1 (every M-JPEG/M-PNG frame
    * is a keyframe). 10 fps nominal; all values little-endian per RIFF.
    */
  private[graft] def muxAvi(
      fourcc: String,
      w: Int,
      h: Int,
      frames: Seq[Array[Byte]]
  ): Array[Byte] = {
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      putU32(b, 100000L) // microseconds per frame (10 fps)
      putU32(b, 0L); putU32(b, 0L)
      putU32(b, 0x10L) // AVIF_HASINDEX
      putU32(b, frames.length.toLong); putU32(b, 0L)
      putU32(b, 1L) // one stream
      putU32(b, maxFrame.toLong)
      putU32(b, w.toLong); putU32(b, h.toLong)
      (0 until 4).foreach(_ => putU32(b, 0L))
      b.toByteArray
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      putFcc(b, "vids"); putFcc(b, fourcc)
      putU32(b, 0L) // flags
      putU16(b, 0); putU16(b, 0) // priority, language
      putU32(b, 0L) // initial frames
      putU32(b, 1L); putU32(b, 10L) // scale/rate = 10 fps
      putU32(b, 0L); putU32(b, frames.length.toLong)
      putU32(b, maxFrame.toLong)
      putU32(b, 0xffffffffL) // quality: default
      putU32(b, 0L) // sample size: varies per frame
      putU16(b, 0); putU16(b, 0); putU16(b, w); putU16(b, h) // rcFrame
      b.toByteArray
    }
    val strf = { // BITMAPINFOHEADER
      val b = new java.io.ByteArrayOutputStream()
      putU32(b, 40L); putU32(b, w.toLong); putU32(b, h.toLong)
      putU16(b, 1); putU16(b, 24) // planes, nominal decoded bit depth
      putFcc(b, fourcc) // biCompression
      putU32(b, (w * h * 3).toLong)
      (0 until 4).foreach(_ => putU32(b, 0L))
      b.toByteArray
    }
    val hdrl = riffList(
      "hdrl",
      riffChunk("avih", avih) ++
        riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val frameChunks = frames.map(riffChunk("00dc", _))
    val movi = riffList("movi", frameChunks.flatten.toArray)
    val idx1 = {
      val b = new java.io.ByteArrayOutputStream()
      var off = 4L // idx1 offsets are relative to the 'movi' fourcc
      frameChunks.zip(frames).foreach { case (c, f) =>
        putFcc(b, "00dc")
        putU32(b, 0x10L) // AVIIF_KEYFRAME
        putU32(b, off); putU32(b, f.length.toLong)
        off += c.length
      }
      riffChunk("idx1", b.toByteArray)
    }
    val body = hdrl ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream()
    putFcc(out, "RIFF"); putU32(out, (4 + body.length).toLong)
    putFcc(out, "AVI "); out.write(body)
    out.toByteArray
  }

  /** Render one fixture clip as a Motion-PNG AVI. */
  private[graft] def renderAvi(id: Long): Array[Byte] = {
    val (w, h, n, _) = videoParams(id)
    muxAvi("MPNG", w, h, (0 until n).map(renderVideoFrame(id, _)))
  }

  /** Deterministic AVI media fixture: one Motion-PNG clip per document
    * id, muxed on the executors. Stands in for a video corpus read via
    * [[fromBinaryFiles]] on a real cluster.
    */
  def syntheticVideoMedia(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map(id => MediaRow(id, "video/avi", renderAvi(id)))
      .toDF()
  }

  private def fccAt(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def u32At(bytes: Array[Byte], off: Int): Long =
    (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)

  /** Parsed AVI stream: the video stream's declared fourcc and dims plus
    * the stream-0 frame payloads in presentation order.
    */
  private[graft] final case class AviStream(
      fourcc: String,
      width: Int,
      height: Int,
      frames: Vector[Array[Byte]]
  )

  /** Walk a RIFF/AVI byte array: validate the RIFF 'AVI ' signature,
    * read the video stream's fourcc and dims out of `strh`/`strf`, and
    * collect stream-0 frame chunks (`00dc`/`00db`, including inside
    * 'rec ' record lists) from the `movi` list. Word-aligned chunk
    * stepping per the RIFF rule; loud rejection on anything malformed.
    */
  private[graft] def parseAvi(bytes: Array[Byte]): AviStream = {
    require(bytes.length >= 12, s"not an AVI: ${bytes.length} bytes")
    require(fccAt(bytes, 0) == "RIFF", s"not a RIFF file: '${fccAt(bytes, 0)}'")
    val riffSize = u32At(bytes, 4)
    require(
      riffSize + 8 <= bytes.length,
      s"truncated RIFF: declares ${riffSize + 8} bytes, have ${bytes.length}")
    require(fccAt(bytes, 8) == "AVI ", s"not an AVI form: '${fccAt(bytes, 8)}'")

    var fourcc: String = null
    var w = -1
    var h = -1
    val frames = Vector.newBuilder[Array[Byte]]

    def walkMovi(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fccAt(bytes, off)
        val size = u32At(bytes, off + 4).toInt
        require(size >= 0, s"movi chunk '$id' declares a size beyond 2 GiB")
        require(off + 8 + size <= to, s"movi chunk '$id' overruns the list")
        if (id == "LIST" && fccAt(bytes, off + 8) == "rec ")
          walkMovi(off + 12, off + 8 + size)
        else if (id == "00dc" || id == "00db")
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        off += 8 + size + (size & 1)
      }
    }
    def walkStrl(from: Int, to: Int): Unit = {
      var off = from
      var isVids = false
      while (off + 8 <= to) {
        val id = fccAt(bytes, off)
        val size = u32At(bytes, off + 4).toInt
        require(size >= 0, s"strl chunk '$id' declares a size beyond 2 GiB")
        if (id == "strh" && size >= 8) {
          isVids = fccAt(bytes, off + 8) == "vids"
          if (isVids) fourcc = fccAt(bytes, off + 12)
        } else if (id == "strf" && isVids && size >= 12) {
          // BITMAPINFOHEADER: biWidth at +4, biHeight at +8
          w = u32At(bytes, off + 12).toInt
          h = u32At(bytes, off + 16).toInt
        }
        off += 8 + size + (size & 1)
      }
    }
    def walkHdrl(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fccAt(bytes, off)
        val size = u32At(bytes, off + 4).toInt
        require(size >= 0, s"hdrl chunk '$id' declares a size beyond 2 GiB")
        if (id == "LIST" && fccAt(bytes, off + 8) == "strl")
          walkStrl(off + 12, off + 8 + size)
        off += 8 + size + (size & 1)
      }
    }

    var off = 12
    val end = (riffSize + 8).toInt
    while (off + 8 <= end) {
      val id = fccAt(bytes, off)
      val size = u32At(bytes, off + 4).toInt
      require(size >= 0, s"chunk '$id' declares a size beyond 2 GiB")
      require(off + 8 + size <= end, s"chunk '$id' overruns the RIFF size")
      if (id == "LIST") fccAt(bytes, off + 8) match {
        case "hdrl" => walkHdrl(off + 12, off + 8 + size)
        case "movi" => walkMovi(off + 12, off + 8 + size)
        case _      => () // other lists (INFO, …) are legal and skipped
      }
      off += 8 + size + (size & 1)
    }
    require(fourcc != null, "no 'vids' stream header in hdrl")
    require(w > 0 && h > 0, s"no valid strf dims (got ${w}x$h)")
    AviStream(fourcc, w, h, frames.result())
  }

  /** REAL video decode: walk the AVI container, decode every frame
    * through `javax.imageio` (PNG for `MPNG` clips, JPEG for `MJPG` —
    * both JRE codecs), check each decoded frame against the container's
    * declared dims, and emit the stream metadata plus the whole-clip
    * raster sample sum. Same partition-local batched iterator as
    * [[decodeImages]] — the shape a native/GPU video frontend would
    * slot into.
    */
  def decodeVideo(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64
  ): Dataset[DecodedVideoRow] = {
    import spark.implicits._
    batched(spark, media, batchSize) { m =>
      val s = parseAvi(m.payload)
      require(s.frames.nonEmpty, s"doc ${m.doc_id}: AVI has no frames")
      var sum = 0L
      s.frames.zipWithIndex.foreach { case (fb, i) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
        require(img != null, s"doc ${m.doc_id}: frame $i is not decodable")
        require(
          img.getWidth == s.width && img.getHeight == s.height,
          s"doc ${m.doc_id}: frame $i is ${img.getWidth}x${img.getHeight}, " +
            s"container declares ${s.width}x${s.height}")
        sum += sampleSum(img)
      }
      DecodedVideoRow(
        m.doc_id, s.fourcc, s.width, s.height, s.frames.length, sum)
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
