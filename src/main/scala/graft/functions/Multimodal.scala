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
    val src = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> mmBinaryFeatures _,
    "mm_decode_meta"     -> mmDecodeMeta _,
    "mm_frame_sample"    -> mmFrameSample _,
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
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, f AS frame_idx,
        |  md5(text || '-' || CAST(f AS VARCHAR)) AS frame_fp
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, octet_length(encode(text)) % 24)) AS f
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
