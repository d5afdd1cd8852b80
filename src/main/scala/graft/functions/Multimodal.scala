package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted inside the executors.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (`FakeDecoder`) — but the Spark
  * plumbing is real: a `binary` payload column, a typed `mapPartitions`
  * pass (the Scala analogue of `mapInPandas` batch processing: one
  * decoder instantiation per partition, streaming rows through it), and
  * a fan-out of sampled frames. At scale the payload column would be
  * parquet `binary` (or binaryFile paths) and the same partition-wise
  * decode applies unchanged.
  */
object Multimodal {

  /** Deterministic stand-in for an image/audio decoder. Derives pseudo
    * metadata purely from payload length so the DuckDB oracle can
    * replicate it; a real build swaps `decode` for javax.imageio/ffmpeg.
    */
  object FakeDecoder {
    case class Meta(doc_id: Long, byte_len: Int, width: Int, height: Int, n_frames: Int)
    def decode(docId: Long, payload: Array[Byte]): Meta = {
      val n = payload.length
      Meta(docId, n, 1 + n % 640, 1 + (n * 7) % 480, 1 + n % 24)
    }
  }

  // encoder case class: must live at object scope for a TypeTag (and
  // stay public for Spark's generated projections)
  case class Resized(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, resized_bytes: Long)

  /** Binary feature extraction on the payload column itself — pure
    * expressions (octet_length / md5 / head bytes), no decode. */
  def mmBinaryFeatures(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("text"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        md5(col("payload")).as("fp"),
        substring(col("text"), 1, 4).as("head4"))
      .orderBy("doc_id")

  /** Partition-wise decode: the `mapInPandas` pattern in Scala — one
    * decoder per partition, rows streamed through it. */
  def mmDecodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import FakeDecoder.Meta
    // a row with no payload cannot be decoded: skipped (mirrored in the
    // oracle), never passed into the decoder — a single null blob in a
    // billion-row media table must not kill the pass
    val src = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    val ds = src.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      // Per-partition setup happens here (real decoders are expensive to
      // instantiate — amortize across the partition, never per row).
      rows.map { case (id, payload) => FakeDecoder.decode(id, payload) }
    }(Encoders.product[Meta])
      .orderBy("doc_id")
      .toDF()
  }

  /** Frame sampling fan-out: one row per (pseudo-)frame with a
    * deterministic frame fingerprint. posexplode keeps the frame index —
    * the engine-level fan-out primitive (SURVEY E3). */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        (lit(1) + octet_length(col("text").cast("binary")) % 24).as("n_frames"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("frame_idx", "frame_no")),
        col("text"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("text"), lit("-"), col("frame_idx").cast("string"))
          .cast("binary")).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")

  /** Resize preprocessing over the binary column — the standard ML
    * input normalization (fit into 224×224 preserving aspect ratio),
    * expressed as the same partition-wise pass as [[mmDecodeMeta]]:
    * decode once per row, integer-exact target geometry, output-size
    * model for the re-encoded payload (3 bytes/px RGB). The decode and
    * re-encode are the deterministic fake (no codecs in the container);
    * geometry math and plumbing are the real thing and run unchanged
    * over a real decoder. */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    // null payloads skipped, as in mmDecodeMeta
    val src = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    val ds = src.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val target = 224 // per-partition setup: a real resizer lives here
      rows.map { case (id, payload) =>
        val m = FakeDecoder.decode(id, payload)
        val longest = math.max(m.width, m.height)
        val ow = math.max(1, m.width * target / longest)
        val oh = math.max(1, m.height * target / longest)
        Resized(id, m.width, m.height, ow, oh, ow.toLong * oh * 3)
      }
    }(Encoders.product[Resized])
      .orderBy("doc_id")
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> mmBinaryFeatures _,
    "mm_decode_meta"     -> mmDecodeMeta _,
    "mm_frame_sample"    -> mmFrameSample _,
    "mm_resize"          -> mmResize _,
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  md5(text) AS fp, substring(text, 1, 4) AS head4
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id, n AS byte_len,
        |  CAST(1 + n % 640 AS INT) AS width,
        |  CAST(1 + (n * 7) % 480 AS INT) AS height,
        |  CAST(1 + n % 24 AS INT) AS n_frames
        |FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n
        |      FROM documents WHERE text IS NOT NULL)
        |ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(1 + n % 640 AS INT) AS width,
        |    CAST(1 + (n * 7) % 480 AS INT) AS height
        |  FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n
        |        FROM documents WHERE text IS NOT NULL)),
        |r AS (
        |  SELECT doc_id, width, height,
        |    greatest(1, (width * 224) // greatest(width, height)) AS out_w,
        |    greatest(1, (height * 224) // greatest(width, height)) AS out_h
        |  FROM m)
        |SELECT doc_id, width, height,
        |  CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
        |  CAST(out_w AS BIGINT) * out_h * 3 AS resized_bytes
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, f AS frame_idx,
        |  md5(text || '-' || CAST(f AS VARCHAR)) AS frame_fp
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, octet_length(encode(text)) % 24)) AS f
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
