package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.5 E5): media as opaque binary
  * payloads + typed metadata structs, with decode/feature-extract/
  * resize/frame-sample implemented as per-partition batch operators.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[DecodeStub]] produces a deterministic fake — but the
  * Spark-side plumbing is real and is what matters at 100 TB:
  *  - payloads live in a `binary` column (parquet handles natively,
  *    scans stay columnar, metadata prunes without touching bytes);
  *  - decode runs via `mapPartitions` over an iterator (one batch per
  *    partition in flight, never a full-partition materialization) —
  *    the Scala analogue of a Pandas `mapInPandas` UDF, and the
  *    swap-in point for a real codec;
  *  - everything metadata-only (dimensions, byte sizes, hashes,
  *    format dispatch) stays in codegen'd expressions.
  */
object Multimodal {

  /** Typed payload row: media bytes + metadata struct. */
  final case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  /** Deterministic fake feature row produced by the decode stub. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      // "decoded" dims after resize (stub: clamp to the target box)
      out_width: Int,
      out_height: Int,
      // stub feature vector: 4 bytes sampled at deterministic offsets
      feature: Array[Long])

  /** Build a media table from documents: payload = utf-8 bytes of the
    * text (a stand-in blob with real, verifiable content), metadata
    * derived deterministically from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      element_at(typedlit(Seq("png", "jpeg", "webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      (pmod(col("doc_id"), lit(8)) * 160 + 320).cast(IntegerType).as("width"),
      (pmod(col("doc_id"), lit(5)) * 90 + 180).cast(IntegerType).as("height"))

  /** Metadata-only projection — never touches the payload bytes
    * (column pruning keeps the binary out of the scan entirely). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("format"), col("width"), col("height"),
      octet_length(col("payload")).cast(LongType).as("n_bytes"),
      md5(col("payload")).as("payload_md5"))

  /** The decode seam. A real implementation would wrap an image codec;
    * the stub "decodes" deterministically from the bytes so tests can
    * assert exact values. Runs inside mapPartitions — batch-at-a-time,
    * no driver involvement, executor-parallel. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow, targetW: Int, targetH: Int): MediaFeatures
  }

  object DecodeStub extends Decoder {
    override def decode(r: MediaRow, targetW: Int, targetH: Int): MediaFeatures = {
      val n = r.payload.length
      // deterministic "sampled pixels": bytes at 4 evenly-spaced offsets
      val feature = (0 until 4).map { i =>
        if (n == 0) 0L else (r.payload(i * n / 4) & 0xffL)
      }.toArray
      MediaFeatures(
        r.doc_id, n.toLong, r.format,
        math.min(r.width, targetW), math.min(r.height, targetH),
        feature)
    }
  }

  /** Decode + resize + feature-extract over the media table. The
    * partition count is inherited from the scan; repartition upstream
    * if payloads are heavily skewed. */
  def decodeFeatures(
      spark: SparkSession, media: DataFrame,
      targetW: Int = 256, targetH: Int = 256,
      decoder: Decoder = DecodeStub): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(decoder.decode(_, targetW, targetH))
    }
  }

  /** Frame-sample analogue: pick every `stride`-th byte offset as a
    * "frame" (metadata-only expression path, no decode). An empty
    * payload yields an empty frame list — guarded explicitly because
    * `sequence(0, -1, stride)` throws under ANSI semantics. */
  def frameOffsets(media: DataFrame, stride: Int): DataFrame =
    media.select(col("doc_id"),
      when(octet_length(col("payload")) === 0,
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false)))
        .otherwise(sequence(lit(0), octet_length(col("payload")) - 1, lit(stride)))
        .as("frame_offsets"))
}
