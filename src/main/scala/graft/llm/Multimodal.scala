package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Multimodal columns: media as opaque `binary` payloads + a typed metadata
  * struct, with decode / feature-extract / resize / frame-sample plumbing.
  *
  * The Spark-side machinery is real — schema, per-partition batched decode,
  * deterministic partitioning — while the codec itself is a STUB: this
  * container has no image/audio libraries, so `FakeCodec` derives metadata
  * deterministically from the payload bytes (documented below). Swapping in
  * a real codec changes ONE function; every schema, batch shape and plan
  * stays identical.
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

  /** The codec stub: a real implementation would parse the container format
    * here (`???` seam). Deterministic fake: geometry derives from payload
    * length, so both engines (and reruns) agree byte-for-byte. */
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
        // real pipeline: initialize the codec ONCE here, then stream batches
        rows.map { case (id, payload, hh) => FakeCodec.decode(id, payload, hh) }
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

  val queries: Map[String, Q] = Map[String, Q](
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_resize_sample" -> (mmResizeSample _),
    "mm_feature_extract" -> (mmFeatureExtract _))

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" -> mmDecodeMetaOracle,
    "mm_resize_sample" -> mmResizeSampleOracle,
    "mm_feature_extract" -> mmFeatureExtractOracle)
}
