package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.5 E5): media as opaque binary
  * payloads + typed metadata structs, with decode/feature-extract/
  * resize/frame-sample implemented as per-partition batch operators.
  *
  * Two decoders sit behind the seam: [[BmpDecoder]] is a REAL pure-JVM
  * codec for uncompressed 24-bit BMP (signature check, little-endian
  * header parse, bottom-up vs top-down row order, 4-byte row padding —
  * the full wire format, not a fake), used by the declared e13 query
  * over [[bmpMediaTable]]'s real BMP payloads. [[DecodeStub]] remains
  * for formats with no in-container codec (png/jpeg/webp dispatch in
  * the e12 metadata fixture). The Spark-side plumbing is shared and is
  * what matters at 100 TB:
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

  /** The decode seam. Implementations parse the payload bytes (a real
    * codec for BMP below; a deterministic stub for codec-less formats).
    * Runs inside mapPartitions — batch-at-a-time, no driver
    * involvement, executor-parallel. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow, targetW: Int, targetH: Int): MediaFeatures
  }

  /** Minimal uncompressed 24-bit BMP writer (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, BI_RGB, bottom-up rows, rows padded to 4 bytes).
    * Pixel channel `c` of pixel (x, y) carries `src[((y·w+x)·3+c) mod
    * |src|]` — a flat byte grid over the source text, so an external
    * SQL oracle can restate any sampled pixel arithmetically. Public
    * format: en.wikipedia.org/wiki/BMP_file_format. */
  object Bmp {
    val HeaderSize = 54
    def rowSize(w: Int): Int = ((3 * w + 3) / 4) * 4
    def encode(w: Int, h: Int, src: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0, s"bmp dims out of range: ${w}x$h")
      val rs = rowSize(w)
      val out = new Array[Byte](HeaderSize + rs * h)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(out.length)
        .putShort(0).putShort(0).putInt(HeaderSize)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rs * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            val p = (y * w + x) * 3 + c
            out(HeaderSize + (h - 1 - y) * rs + x * 3 + c) =
              if (src.isEmpty) 0 else src(p % src.length)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Parsed BMP: header-derived dimensions plus random access to pixel
    * channel (x, y, c) accounting for row order and padding. */
  private[ext] final case class ParsedBmp(
      w: Int, h: Int, nBytes: Long, px: (Int, Int, Int) => Int)

  /** Shared wire-format parse: validates the `BM` signature, reads the
    * pixel data offset, dimensions, bit depth and compression from the
    * little-endian headers, and honors bottom-up (positive height) vs
    * top-down (negative height) row order and 4-byte row padding.
    * Dimensions come from the HEADER, not the metadata columns — a
    * codec trusts the bytes. */
  private[ext] def parseBmp(docId: Long, p: Array[Byte]): ParsedBmp = {
    require(p.length >= Bmp.HeaderSize && p(0) == 'B' && p(1) == 'M',
      s"doc $docId: not a BMP payload")
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    require(bb.getInt(14) >= 40, s"doc $docId: pre-v3 BMP header")
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    // hostile-header guards: a negative/zero dimension or a data offset
    // inside the headers would otherwise surface as an
    // ArrayIndexOutOfBounds from px() instead of a diagnosable reject
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"doc $docId: implausible BMP dimensions ${w}x$rawH")
    require(dataOff >= Bmp.HeaderSize && dataOff <= p.length,
      s"doc $docId: pixel data offset $dataOff out of range")
    require(bb.getShort(28) == 24, s"doc $docId: only 24bpp supported")
    require(bb.getInt(30) == 0, s"doc $docId: compressed BMP unsupported")
    val rs = Bmp.rowSize(w)
    require(p.length.toLong >= dataOff.toLong + rs.toLong * h,
      s"doc $docId: truncated pixel array")
    ParsedBmp(w, h, p.length.toLong, (x, y, c) => {
      val fileRow = if (topDown) y else h - 1 - y
      p(dataOff + fileRow * rs + x * 3 + c) & 0xff
    })
  }

  /** Real BMP decode. Features are the 4 SOURCE corner pixels' B+G+R
    * sums; the reported output box keeps the clamp semantics (see
    * [[BmpResizeDecoder]] for features off the resized grid). */
  object BmpDecoder extends Decoder {
    override def decode(r: MediaRow, targetW: Int, targetH: Int): MediaFeatures = {
      val b = parseBmp(r.doc_id, r.payload)
      val corners = Array((0, 0), (b.w - 1, 0), (0, b.h - 1), (b.w - 1, b.h - 1))
      val feature = corners.map { case (x, y) =>
        (b.px(x, y, 0) + b.px(x, y, 1) + b.px(x, y, 2)).toLong
      }
      MediaFeatures(r.doc_id, b.nBytes, r.format,
        math.min(b.w, targetW), math.min(b.h, targetH), feature)
    }
  }

  /** BMP decode + REAL nearest-neighbor resize: the output box is
    * (min(w, targetW), min(h, targetH)) and output pixel (x, y)
    * samples source pixel ((x·w) div outW, (y·h) div outH) — the
    * standard NN grid map, integer-exact so an external SQL oracle can
    * restate any resized sample. Features are the RESIZED image's
    * corner B+G+R sums, which differ from the source corners whenever
    * the resize actually shrinks (e.g. w=8 → outW=6 maps the right
    * edge to source column (5·8) div 6 = 6, not 7). */
  object BmpResizeDecoder extends Decoder {
    override def decode(r: MediaRow, targetW: Int, targetH: Int): MediaFeatures = {
      val b = parseBmp(r.doc_id, r.payload)
      val outW = math.min(b.w, targetW)
      val outH = math.min(b.h, targetH)
      def srcPx(xo: Int, yo: Int, c: Int): Int =
        b.px(xo * b.w / outW, yo * b.h / outH, c)
      val corners = Array((0, 0), (outW - 1, 0), (0, outH - 1), (outW - 1, outH - 1))
      val feature = corners.map { case (x, y) =>
        (srcPx(x, y, 0) + srcPx(x, y, 1) + srcPx(x, y, 2)).toLong
      }
      MediaFeatures(r.doc_id, b.nBytes, r.format, outW, outH, feature)
    }
  }

  /** Media table with REAL BMP payloads: each document's text bytes are
    * laid out as the pixel grid of a small w×h 24-bit BMP (dims derived
    * from doc_id so the oracle can recompute them). Fixture generation
    * runs as a typed per-partition map — the same executor-parallel
    * shape the decode path uses. */
  def bmpMediaTable(spark: SparkSession, docs: DataFrame,
      corruptEvery: Long = 0): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      // corruptEvery > 0: every corruptEvery-th doc carries its raw text
      // bytes instead of a BMP — the deterministic bad-payload fixture
      // for the lenient-decode path (never a valid BMP: the fixture
      // vocabulary cannot produce a 'BM' signature)
      val payload =
        if (corruptEvery > 0 && id % corruptEvery == 0)
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        else Bmp.encode(w, h, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      MediaRow(id, payload, "bmp", w, h)
    }.toDF()
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

  /** Decoded row with per-row error isolation: `ok=false` rows carry
    * the reject reason and null-ish features instead of killing the
    * task. */
  final case class MediaResult(
      doc_id: Long, ok: Boolean, error: String,
      n_bytes: Long, out_width: Int, out_height: Int, feature: Array[Long])

  /** [[decodeFeatures]] with per-row error isolation — the multimodal
    * analogue of the sync's corrupt-file skip (O24): at 100 TB a media
    * batch WILL contain undecodable payloads, and one bad row must
    * fail as data (`ok=false` + reason) rather than as a task abort
    * that retries the whole partition into the same exception four
    * times. Same mapPartitions seam; the try/catch rides inside the
    * iterator, so throughput for healthy rows is unchanged. */
  def decodeFeaturesLenient(
      spark: SparkSession, media: DataFrame,
      targetW: Int = 256, targetH: Int = 256,
      decoder: Decoder = DecodeStub): Dataset[MediaResult] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        try {
          val f = decoder.decode(r, targetW, targetH)
          MediaResult(f.doc_id, ok = true, error = "",
            f.n_bytes, f.out_width, f.out_height, f.feature)
        } catch {
          case e: IllegalArgumentException =>
            MediaResult(r.doc_id, ok = false,
              error = Option(e.getMessage).getOrElse("decode failed"),
              n_bytes = r.payload.length.toLong, out_width = 0, out_height = 0,
              feature = Array.empty[Long])
        }
      }
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
