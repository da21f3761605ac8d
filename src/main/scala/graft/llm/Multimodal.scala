package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Multimodal columns: media as opaque `binary` payloads + a typed metadata
  * struct, with decode / feature-extract / resize / frame-sample plumbing.
  *
  * Two codecs sit behind the decode seam:
  *  - `ImageIoCodec` — a REAL image decoder/encoder on JDK `javax.imageio`
  *    (PNG/GIF/BMP/JPEG, zero new dependencies): magic-byte sniff, true
  *    pixel-dimension decode, Graphics2D resize + PNG re-encode. The
  *    `mm_decode_real` key drives genuine PNG bytes through the full
  *    encode → decode → resize → re-encode → re-decode chain and the
  *    DuckDB oracle independently predicts every decoded dimension.
  *  - `WavCodec` (r8) — a REAL audio decoder/encoder on JDK
  *    `javax.sound.sampled` (PCM WAV containers, zero new dependencies):
  *    RIFF sniff, true header parse (rate / channels / frame count), and
  *    full PCM data decode. The `mm_decode_audio` key round-trips genuine
  *    WAV bytes and the oracle predicts every decoded number, including a
  *    sum over the decoded samples.
  *  - `FakeCodec` — the disclosed deterministic stand-in for the VIDEO
  *    modality only (permanent scope: the JDK ships no video container
  *    parser and this build resolves no third-party dependencies, so a
  *    real video codec is a deployment-time swap behind this same seam):
  *    geometry derives from payload length so both engines agree
  *    byte-for-byte.
  * `ImageIoCodec.decode` sniffs image, then WAV, then falls back to
  * `FakeCodec`, so one seam is total over arbitrary payloads.
  *
  * Scale design: payloads live in their own column so parquet column pruning
  * skips the bytes when a query touches only metadata; decode runs in
  * `mapPartitions` (one codec init per partition, row-batched), exactly how
  * a real pipeline amortizes decoder setup at 100 TB.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Decoded-media record produced by the (stubbed) codec. */
  final case class MediaMeta(
      doc_id: Long, modality: String, n_bytes: Long, header_hex: String,
      width: Int, height: Int, channels: Int, sample_rate: Int, n_frames: Int)

  /** The deterministic stand-in behind the codec seam — after r8 the
    * PERMANENT fallback only for video (images decode via ImageIO, WAV
    * audio via WavCodec; the JDK has no video parser and this build takes
    * no third-party dependencies). Geometry derives from payload length,
    * so both engines (and reruns) agree byte-for-byte. */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte], headerHex: String): MediaMeta = {
      val n = payload.length.toLong
      val modality = (docId % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaMeta(
        doc_id = docId, modality = modality, n_bytes = n,
        header_hex = headerHex,
        width = if (modality == "audio") 0 else (64 + (n % 577)).toInt,
        height = if (modality == "audio") 0 else (64 + ((n * 31 + 7) % 417)).toInt,
        channels = if (modality == "audio") 1 else 3,
        sample_rate = if (modality == "audio") (8000 + (n % 3) * 4000).toInt else 0,
        n_frames = if (modality == "video") (1 + (n % 240)).toInt else 1)
    }
  }

  /** Real image codec on JDK `javax.imageio` — no dependencies beyond the
    * JDK. Handles the formats ImageIO ships readers for (PNG, GIF, BMP,
    * JPEG); everything else falls back to the disclosed FakeCodec so the
    * decode seam is total over arbitrary payloads. */
  object ImageIoCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // ImageIO defaults to DISK-backed image streams (a temp file per
    // encode/decode) — pure overhead for in-memory byte[] round-trips and
    // the dominant cost at corpus scale (16s → ~4s for the 5000-image key)
    ImageIO.setUseCache(false)

    /** Container sniff on magic bytes — cheap, no decoder spin-up for
      * payloads that can't be images. */
    def sniff(payload: Array[Byte]): Option[String] = {
      def at(i: Int): Int = payload(i) & 0xff
      if (payload.length < 8) None
      else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
        Some("png")
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
        Some("gif")
      else if (at(0) == 'B' && at(1) == 'M') Some("bmp")
      else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
      else None
    }

    /** True pixel decode; None when the payload is not a parseable image. */
    def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
      sniff(payload).flatMap { _ =>
        Option(ImageIO.read(new ByteArrayInputStream(payload)))
      }

    /** The total decode seam: real ImageIO metadata for image payloads,
      * real javax.sound parse for WAV audio, FakeCodec (disclosed,
      * permanent) for the video modality the JDK can't parse. */
    def decode(docId: Long, payload: Array[Byte], headerHex: String): MediaMeta =
      decodeImage(payload) match {
        case Some(img) => MediaMeta(
          doc_id = docId, modality = "image", n_bytes = payload.length.toLong,
          header_hex = headerHex, width = img.getWidth, height = img.getHeight,
          channels = img.getRaster.getNumBands, sample_rate = 0, n_frames = 1)
        case None => WavCodec.decode(docId, payload, headerHex)
          .getOrElse(FakeCodec.decode(docId, payload, headerHex))
      }

    /** Deterministic PNG encode: a w×h RGB image with a fixed per-pixel
      * gradient (so re-decodes exercise real pixel data, not a degenerate
      * all-black frame). */
    def encodePng(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      // fill the raster's backing byte array directly — setRGB per pixel
      // walks the color model once per call and dominated encode time
      val buf = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      // row-constant pattern: real nonzero pixels (the codec spec checks
      // exact pixel values on a hand-crafted fixture; here the point is
      // true geometry round-trip), deflate-friendly so encode stays cheap
      var i = 0
      while (i < buf.length) {
        buf(i) = (((i / (3 * w)) * 7 + 13) & 0xff).toByte
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real byte-level resize: decode, scale the long side down to
      * `maxSide` with the SAME truncation arithmetic as the metadata-level
      * `resize` (scale = maxSide/max(w,h); floor; clamp ≥ 1), render via
      * Graphics2D, re-encode PNG. No-op (returns input) when already
      * within bounds. */
    def resizeBytes(payload: Array[Byte], maxSide: Int): Array[Byte] =
      decodeImage(payload) match {
        case Some(img) if img.getWidth > maxSide || img.getHeight > maxSide =>
          val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
          val tw = math.max(1, (img.getWidth * scale).toInt)
          val th = math.max(1, (img.getHeight * scale).toInt)
          val out = new BufferedImage(tw, th, BufferedImage.TYPE_3BYTE_BGR)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, tw, th, null) finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          bos.toByteArray
        case _ => payload
      }
  }

  /** Real audio codec on JDK `javax.sound.sampled` — no dependencies
    * beyond the JDK (the java.desktop module ships WAV/AIFF/AU container
    * parsers). Encode produces a genuine canonical PCM WAV (44-byte RIFF
    * header + interleaved little-endian int16 data) through
    * `AudioSystem.write`; decode parses the container through
    * `AudioSystem.getAudioFileFormat` (header: rate / channels / frames)
    * and streams the PCM data back out through an `AudioInputStream` —
    * both directions exercise the real platform codec, not our own byte
    * slinging. */
  object WavCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Container sniff: RIFF....WAVE magic. */
    def sniff(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E'

    /** Deterministic PCM WAV encode: `frames` interleaved int16 samples
      * per channel, sample(frame f, channel c) = (f*37 + c*11) % 4096 −
      * 2048 — real nonzero audio data whose aggregate the oracle can
      * predict arithmetically. */
    def encodeWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * channels * 2)
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < channels) {
          val v = (f * 37 + c * 11) % 4096 - 2048
          val off = (f * channels + c) * 2
          pcm(off) = (v & 0xff).toByte // little-endian int16
          pcm(off + 1) = ((v >> 8) & 0xff).toByte
          c += 1
        }
        f += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
        true /* signed */, false /* little-endian */)
      val stream = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real header parse; None when the payload is not a parseable WAV
      * (the seam falls through to FakeCodec). */
    def decode(docId: Long, payload: Array[Byte],
        headerHex: String): Option[MediaMeta] =
      if (!sniff(payload)) None
      else try {
        val ff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
        Some(MediaMeta(
          doc_id = docId, modality = "audio",
          n_bytes = payload.length.toLong, header_hex = headerHex,
          width = 0, height = 0,
          channels = ff.getFormat.getChannels,
          sample_rate = ff.getFormat.getSampleRate.toInt,
          n_frames = ff.getFrameLength))
      } catch { case _: Exception => None }

    /** Decode the PCM DATA through the platform codec and fold the int16
      * samples to one exact integer — the proof the decoder reads real
      * audio bytes, not just the header. */
    def pcmSum(payload: Array[Byte]): Long = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val data = in.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) {
          sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
          i += 2
        }
        sum
      } finally in.close()
    }
  }

  /** documents.text reinterpreted as a binary payload column — the testdata
    * stand-in for real media bytes. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batched per-partition decode: one codec per partition, typed output. */
  def decodeAll(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, dir)
      .withColumn("header_hex", expr("substring(hex(payload), 1, 8)"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // one codec init per partition; ImageIoCodec sniffs and decodes
        // real image payloads, falling back to FakeCodec for the rest
        // (documents.text payloads are not images, so the existing oracle
        // contract is unchanged — mm_decode_real drives the real path)
        rows.map { case (id, payload, hh) => ImageIoCodec.decode(id, payload, hh) }
      }
  }

  /** Resize plumbing: pure metadata transform over decoded records (a real
    * impl would also rewrite payload bytes — same seam as FakeCodec). */
  def resize(meta: Dataset[MediaMeta], maxSide: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      if (m.width <= maxSide && m.height <= maxSide) m
      else {
        val scale = maxSide.toDouble / math.max(m.width, m.height)
        m.copy(width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt))
      }
    }
  }

  /** Frame sampling: every k-th frame of video records. */
  def frameSample(meta: Dataset[MediaMeta], everyK: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.map(m => if (m.modality == "video")
      m.copy(n_frames = (m.n_frames + everyK - 1) / everyK) else m)
  }

  // ---- mm_decode_meta: the oracle-checked slice -----------------------------
  // Declarative twin of FakeCodec for the DuckDB compare: byte length +
  // header come from real binary ops (cast-to-binary / encode, substring,
  // hex) in BOTH engines; the fake geometry is the same integer arithmetic.
  def mmDecodeMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"),
        expr("length(payload)").as("n_bytes"),
        expr("substring(hex(payload), 1, 8)").as("header_hex"))
      .withColumn("modality", expr(
        "case when doc_id % 3 = 0 then 'image' when doc_id % 3 = 1 then 'audio' else 'video' end"))
      .withColumn("width", expr(
        "case when modality = 'audio' then 0 else cast(64 + n_bytes % 577 as int) end"))
      .withColumn("height", expr(
        "case when modality = 'audio' then 0 else cast(64 + (n_bytes * 31 + 7) % 417 as int) end"))
      .withColumn("n_frames", expr(
        "case when modality = 'video' then cast(1 + n_bytes % 240 as int) else 1 end"))
      .orderBy(col("doc_id"))

  private val mmDecodeMetaOracle =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       substring(hex(encode(text)), 1, 8) AS header_hex,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |       CASE WHEN doc_id % 3 = 1 THEN 0
      |            ELSE CAST(64 + octet_length(encode(text)) % 577 AS INT) END AS width,
      |       CASE WHEN doc_id % 3 = 1 THEN 0
      |            ELSE CAST(64 + (octet_length(encode(text)) * 31 + 7) % 417 AS INT) END AS height,
      |       CASE WHEN doc_id % 3 = 2 THEN CAST(1 + octet_length(encode(text)) % 240 AS INT)
      |            ELSE 1 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- mm_resize_sample: the TYPED pipeline end to end ----------------------
  // Unlike mm_decode_meta (the declarative twin), this key runs the real
  // Dataset plumbing — mapPartitions decode, map-based resize(512) and
  // frameSample(4) — and the oracle replays the whole chain relationally:
  // truncating resize (floor of w * (512/maxside), identical IEEE-double
  // order of operations in both engines) and ceil-division frame
  // sampling. A hash match here proves the typed path computes exactly
  // what the declarative spec says, so swapping FakeCodec for a real
  // codec is the only step left to production.
  def mmResizeSample(s: SparkSession, dir: String): DataFrame =
    frameSample(resize(decodeAll(s, dir), 512), 4)
      .toDF()
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        col("header_hex"), col("width"), col("height"), col("channels"),
        col("sample_rate"), col("n_frames"))
      .orderBy(col("doc_id"))

  private val mmResizeSampleOracle =
    """WITH dec AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |         octet_length(encode(text)) AS n_bytes,
      |         substring(hex(encode(text)), 1, 8) AS header_hex,
      |         CASE WHEN doc_id % 3 = 1 THEN 0
      |              ELSE CAST(64 + octet_length(encode(text)) % 577 AS INT) END AS width,
      |         CASE WHEN doc_id % 3 = 1 THEN 0
      |              ELSE CAST(64 + (octet_length(encode(text)) * 31 + 7) % 417 AS INT) END AS height,
      |         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels,
      |         CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (octet_length(encode(text)) % 3) * 4000 AS INT) ELSE 0 END AS sample_rate,
      |         CASE WHEN doc_id % 3 = 2 THEN CAST(1 + octet_length(encode(text)) % 240 AS INT)
      |              ELSE 1 END AS n_frames
      |  FROM documents),
      |resized AS (
      |  SELECT doc_id, modality, n_bytes, header_hex,
      |         CASE WHEN width <= 512 AND height <= 512 THEN width
      |              ELSE GREATEST(1, CAST(FLOOR(width * (512.0 / GREATEST(width, height))) AS INT)) END AS width,
      |         CASE WHEN width <= 512 AND height <= 512 THEN height
      |              ELSE GREATEST(1, CAST(FLOOR(height * (512.0 / GREATEST(width, height))) AS INT)) END AS height,
      |         channels, sample_rate,
      |         CASE WHEN modality = 'video' THEN CAST((n_frames + 3) // 4 AS INT) ELSE n_frames END AS n_frames
      |  FROM dec)
      |SELECT doc_id, modality, n_bytes, header_hex, width, height,
      |       channels, sample_rate, n_frames
      |FROM resized ORDER BY doc_id""".stripMargin

  // ---- mm_decode_real: REAL codec round-trip, oracle-predicted --------------
  // The key that proves the decoder is real: per doc_id, synthesize genuine
  // PNG bytes at a deterministic size (16+id%57 × 16+(7id+3)%49), decode
  // them with ImageIO (true pixel dimensions, raster band count), resize
  // the BYTES to maxSide=32 via Graphics2D + PNG re-encode, and decode
  // AGAIN. Every emitted number comes out of a real image decoder, twice —
  // yet the oracle predicts all of them arithmetically, because the encode
  // geometry and the truncating resize rule are pure functions of doc_id.
  // A fake decoder (or a resize that didn't really rewrite pixels) could
  // not hash-match: the second decode reads dimensions from re-encoded
  // PNG bytes the oracle never sees. (Geometry spans both the no-op and
  // the downscale branch of the resize rule; sizes are kept small because
  // the evidence is the round-trip, not the pixel count.)
  def mmDecodeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        // codec (ImageIO plugin registry) warmed once per partition
        ids.map { id =>
          val w = (16 + id % 57).toInt
          val h = (16 + (id * 7 + 3) % 49).toInt
          val png = ImageIoCodec.encodePng(w, h)
          val dec = ImageIoCodec.decode(id, png, "89504E47")
          val resized = ImageIoCodec.resizeBytes(png, 32)
          val dec2 = ImageIoCodec.decode(id, resized, "89504E47")
          (id, dec.modality, dec.width, dec.height, dec.channels,
            dec2.width, dec2.height)
        }
      }
      .toDF("doc_id", "modality", "width", "height", "channels",
        "resized_w", "resized_h")
      .orderBy(col("doc_id"))
  }

  private val mmDecodeRealOracle =
    """WITH g AS (
      |  SELECT doc_id,
      |         CAST(16 + doc_id % 57 AS INT) AS width,
      |         CAST(16 + (doc_id * 7 + 3) % 49 AS INT) AS height
      |  FROM documents)
      |SELECT doc_id, 'image' AS modality, width, height, CAST(3 AS INT) AS channels,
      |       CASE WHEN width <= 32 AND height <= 32 THEN width
      |            ELSE GREATEST(1, CAST(FLOOR(width * (32.0 / GREATEST(width, height))) AS INT)) END AS resized_w,
      |       CASE WHEN width <= 32 AND height <= 32 THEN height
      |            ELSE GREATEST(1, CAST(FLOOR(height * (32.0 / GREATEST(width, height))) AS INT)) END AS resized_h
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- mm_decode_audio: REAL audio codec round-trip, oracle-predicted -------
  // The audio twin of mm_decode_real (retiring the audio half of the
  // FakeCodec scope): per doc_id, synthesize a genuine PCM WAV at a
  // deterministic (rate, channels, frames) through the platform encoder,
  // parse the container back with javax.sound (header numbers), then
  // decode the PCM DATA through an AudioInputStream and sum the int16
  // samples. Every emitted number passes through the real JDK audio
  // stack twice — yet the oracle predicts all of them arithmetically
  // (the canonical WAV written by the JDK is 44 header bytes + 2 bytes
  // per sample, and the sample generator is a pure function of the
  // frame/channel index). A decoder that didn't actually parse RIFF or
  // didn't read the data section could not hash-match pcm_sum.
  def mmDecodeAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        // platform mixer/provider registry warmed once per partition
        ids.map { id =>
          val rate = (id % 3) match {
            case 0 => 8000; case 1 => 16000; case _ => 44100
          }
          val channels = (1 + id % 2).toInt
          val frames = (500 + id % 997).toInt
          val wav = WavCodec.encodeWav(rate, channels, frames)
          val meta = WavCodec.decode(id, wav, "52494646")
            .getOrElse(sys.error(s"real WAV did not parse for doc $id"))
          (id, meta.modality, meta.sample_rate, meta.channels, meta.n_frames,
            meta.n_bytes, WavCodec.pcmSum(wav))
        }
      }
      .toDF("doc_id", "modality", "sample_rate", "channels", "n_frames",
        "n_bytes", "pcm_sum")
      .orderBy(col("doc_id"))
  }

  private val mmDecodeAudioOracle =
    """WITH g AS (
      |  SELECT doc_id,
      |         CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |              ELSE 44100 END AS INT) AS sample_rate,
      |         CAST(1 + doc_id % 2 AS INT) AS channels,
      |         CAST(500 + doc_id % 997 AS INT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, 'audio' AS modality, sample_rate, channels, n_frames,
      |       CAST(44 + n_frames * channels * 2 AS BIGINT) AS n_bytes,
      |       CAST(list_sum(list_transform(generate_series(0, n_frames * channels - 1),
      |         i -> ((i // channels) * 37 + (i % channels) * 11) % 4096 - 2048)) AS BIGINT) AS pcm_sum
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- mm_feature_extract: per-media feature vectors ------------------------
  // The feature-extraction stage of a multimodal pipeline (the step between
  // decode and embedding): a per-partition featurizer walks the payload
  // bytes ONCE and emits exact integer aggregates; the ratio features are
  // then derived declaratively in the repo's decimal-rounding convention,
  // so the formula is shared with the oracle and the only engine-specific
  // code is the byte loop. A real pipeline swaps the nibble statistics for
  // codec-specific features (spectrograms, pixel stats) behind the same
  // seam — integer accumulators out of the loop, declarative math after.
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, sum_nibbles: Long, n_high_nibbles: Long)

  def featurizeAll(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one featurizer init per partition; payload walked exactly once
        rows.map { case (id, payload) =>
          var sum = 0L
          var high = 0L
          var i = 0
          while (i < payload.length) {
            val b = payload(i) & 0xff
            val hi = b >>> 4
            val lo = b & 0xf
            sum += hi + lo
            if (hi >= 8) high += 1
            if (lo >= 8) high += 1
            i += 1
          }
          MediaFeatures(id, payload.length.toLong, sum, high)
        }
      }
  }

  def mmFeatureExtract(s: SparkSession, dir: String): DataFrame =
    featurizeAll(s, dir)
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("sum_nibbles"),
        col("n_high_nibbles"),
        expr("""cast(round(cast(cast(sum_nibbles as double) / (2 * n_bytes)
                |  as decimal(28,8)), 4) as double)""".stripMargin)
          .as("mean_nibble"),
        expr("""cast(round(cast(cast(n_high_nibbles as double) / (2 * n_bytes)
                |  as decimal(28,8)), 4) as double)""".stripMargin)
          .as("frac_high"))
      .orderBy(col("doc_id"))

  private val mmFeatureExtractOracle =
    """WITH f AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |         list_sum(list_transform(generate_series(1, len(hex(encode(text)))),
      |           i -> instr('0123456789ABCDEF', substring(hex(encode(text)), i, 1)) - 1)) AS sum_nibbles,
      |         len(regexp_replace(hex(encode(text)), '[^89ABCDEF]', '', 'g')) AS n_high_nibbles
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |       CAST(sum_nibbles AS BIGINT) AS sum_nibbles,
      |       CAST(n_high_nibbles AS BIGINT) AS n_high_nibbles,
      |       CAST(ROUND(CAST(CAST(sum_nibbles AS DOUBLE) / (2 * n_bytes) AS DECIMAL(28,8)), 4) AS DOUBLE) AS mean_nibble,
      |       CAST(ROUND(CAST(CAST(n_high_nibbles AS DOUBLE) / (2 * n_bytes) AS DECIMAL(28,8)), 4) AS DOUBLE) AS frac_high
      |FROM f ORDER BY doc_id""".stripMargin

  // ---- mm_phash_dedup: perceptual-hash image dedup off the REAL raster -----
  // The image twin of dedup_exact: an average-hash (the aHash of classic
  // perceptual image dedup) computed from GENUINELY DECODED pixels — per
  // doc, encode the deterministic PNG, ImageIO-decode it back, split the
  // rows into 8 bands and set bit b when band b's mean gray exceeds the
  // image mean (integer cross-multiplied: band_sum·h > total·band_rows, no
  // float mean can disagree). Images whose content pattern repeats across
  // docs (here: equal heights → identical row profile) collapse to the
  // same hash; the dedup verdict is one hash-groupBy — the 32-byte-key
  // shuffle of dedup_exact, on media. The oracle never decodes a pixel:
  // it PREDICTS every band sum arithmetically from the generator formula,
  // so the whole ImageIO encode→decode→raster-walk must reproduce the
  // specified image exactly for the hash to match. At 100 TB: decode is
  // mapPartitions next to the payload column (parquet-pruned), the hash
  // is one byte per image, and the groupBy shuffles hashes, not pixels.
  def mmPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = load(s, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 57).toInt
          val h = (16 + (id * 7 + 3) % 49).toInt
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(ImageIoCodec.encodePng(w, h)))
          val raster = img.getRaster
          // per-band gray sums from the decoded raster (channel 0 — the
          // generator writes all three channels equal)
          val bandSum = new Array[Long](8)
          val bandCnt = new Array[Long](8)
          var y = 0
          while (y < h) {
            val b = y * 8 / h
            bandSum(b) += raster.getSample(0, y, 0).toLong
            bandCnt(b) += 1
            y += 1
          }
          val total = bandSum.sum
          var hash = 0
          var b = 0
          while (b < 8) {
            if (bandSum(b) * h > total * bandCnt(b)) hash |= 1 << b
            b += 1
          }
          (id, w, h, hash)
        }
      }
      .toDF("doc_id", "w", "h", "ahash")
    val groups = hashed.groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_same_hash"), min(col("doc_id")).as("keeper"))
    hashed.join(groups, Seq("ahash"))
      .select(col("doc_id"), col("ahash"), col("n_same_hash"), col("keeper"),
        (col("doc_id") =!= col("keeper")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  private val mmPhashDedupOracle =
    """WITH g AS (
      |  SELECT doc_id, CAST(16 + (doc_id * 7 + 3) % 49 AS INT) AS h,
      |         CAST(16 + doc_id % 57 AS INT) AS w
      |  FROM documents),
      |vals AS (
      |  SELECT doc_id, h, y, (y * 7 + 13) % 256 AS v, (y * 8) // h AS b
      |  FROM (SELECT doc_id, h, unnest(generate_series(0, h - 1)) AS y FROM g)),
      |bands AS (
      |  SELECT doc_id, h, b, SUM(v) AS bs, COUNT(*) AS cnt
      |  FROM vals GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, SUM(bs) AS ts FROM bands GROUP BY 1),
      |hash AS (
      |  SELECT bands.doc_id,
      |         CAST(SUM(CASE WHEN bs * h > ts * cnt THEN 1 << b ELSE 0 END) AS INT) AS ahash
      |  FROM bands JOIN tot ON tot.doc_id = bands.doc_id
      |  GROUP BY 1),
      |hashed AS (
      |  SELECT g.doc_id, g.w, g.h, hash.ahash
      |  FROM g JOIN hash ON hash.doc_id = g.doc_id),
      |groups AS (
      |  SELECT ahash, COUNT(*) AS n_same_hash, MIN(doc_id) AS keeper
      |  FROM hashed GROUP BY ahash)
      |SELECT h.doc_id, h.ahash, g2.n_same_hash, g2.keeper,
      |       h.doc_id <> g2.keeper AS is_dup
      |FROM hashed h JOIN groups g2 ON g2.ahash = h.ahash
      |ORDER BY h.doc_id""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "mm_phash_dedup" -> (mmPhashDedup _),
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_decode_real" -> (mmDecodeReal _),
    "mm_decode_audio" -> (mmDecodeAudio _),
    "mm_resize_sample" -> (mmResizeSample _),
    "mm_feature_extract" -> (mmFeatureExtract _))

  val oracles: Map[String, String] = Map(
    "mm_phash_dedup" -> mmPhashDedupOracle,
    "mm_decode_meta" -> mmDecodeMetaOracle,
    "mm_decode_real" -> mmDecodeRealOracle,
    "mm_decode_audio" -> mmDecodeAudioOracle,
    "mm_resize_sample" -> mmResizeSampleOracle,
    "mm_feature_extract" -> mmFeatureExtractOracle)
}
