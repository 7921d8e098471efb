package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque BINARY columns with
  * a typed metadata struct riding next to them. The Spark-side contract —
  * schema, partition behavior, batch shape — is real and tested; the actual
  * media decode is STUBBED (no image/audio codecs in this environment) with
  * a deterministic byte-level fake, clearly marked below.
  *
  * Scale notes: payloads stay in executors end-to-end (no collect); feature
  * extraction is a typed mapPartitions, so one task processes one file split
  * and the decode stub is amortized per-partition; metadata-only queries
  * prune the payload column at the parquet scan.
  */
object Multimodal {

  /** Near-dup windows, shared with the oracle SQL interpolation so the
    * two sides cannot drift (the MarginIvfPairBudget convention).
    * Measured on the corpus (round 15): planted near-dups sit at
    * segment-face L1 ≤ ~3.5 mean-byte units (3.5e6 fix), the
    * same-template background ramps from ~4e6, and the ×N scaler's
    * per-copy Caesar shift puts cross-copy twins at ~5.6e6 — 4e6
    * accepts the planted structure and rejects both.
    */
  val NearDupLenWindow = 16L
  val NearDupL1Threshold = 4000000L

  case class MediaMeta(kind: String, sizeBytes: Long, width: Int, height: Int)
  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  /** Manufacture a media corpus from the documents table: payload = UTF-8
    * bytes of the text (standing in for encoded image/audio bytes), with
    * deterministic fake dimensions derived from the payload length.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRecord(id, bytes, MediaMeta(kind, bytes.length.toLong,
          (nChars % 640).toInt + 1, (nChars % 480).toInt + 1))
      }
  }

  /** ========== STUB ==========
    * Real implementation would decode the payload with an image/audio codec
    * (not available in this container) and pool pixel/sample values. The
    * deterministic fake below extracts an 8-bin byte-value histogram,
    * normalized by payload length — a real computation with the same shape
    * (fixed-dim float vector per record), so downstream operators (ANN over
    * features, filtering on feature norms) exercise genuine plumbing.
    */
  def decodeToFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Float](8)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xFF) >> 5) += 1f
          i += 1
        }
        val n = math.max(r.payload.length, 1).toFloat
        MediaFeatures(r.media_id, r.meta.kind, hist.map(_ / n))
      }
    }
  }

  /** Frame sampling: split the payload into `frames` equal byte-range
    * chunks (a video decoder would seek to key frames; the byte-range split
    * is the deterministic stand-in) and explode one row per sampled frame.
    */
  def sampleFrames(records: Dataset[MediaRecord], frames: Int = 4): DataFrame =
    records.toDF()
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_idx * (meta.sizeBytes div $frames) + 1," +
          s" greatest(meta.sizeBytes div $frames, 1))"))
      .select(col("media_id"), col("meta.kind").as("kind"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"))

  case class MediaDims(
      media_id: Long,
      fmt: String,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      channels: Option[Int])

  /** Media corpus with REAL container encodings (not the histogram stub's
    * raw text bytes): each payload is a structurally valid PNG, JPEG, or
    * WAV wrapping the document text as its data section —
    *
    *   - doc_id % 3 == 0 → PNG: 8-byte signature, IHDR chunk (big-endian
    *     width/height, real CRC32s), an IDAT-shaped data chunk, IEND;
    *   - doc_id % 3 == 1 → JPEG: SOI, APP0/JFIF, DQT, SOF0 (the segment
    *     that carries precision/height/width), SOS + data, EOI — the SOF
    *     sits at a non-fixed conceptual position so readers must walk
    *     marker segments, as with real camera output;
    *   - doc_id % 3 == 2 → WAV: RIFF/WAVE with a canonical fmt chunk
    *     (little-endian sample rate/channels) and a data chunk.
    *
    * Dimensions/rates are deterministic functions of (doc_id, n_chars),
    * so the DuckDB oracle can compute the EXPECTED parse output
    * analytically while the Spark side round-trips through genuine bytes
    * — the hash compare then proves the parser reads the real structure.
    */
  def mediaWithHeaders(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val data = text.getBytes("UTF-8")
        val w = (nChars % 640).toInt + 1
        val h = (nChars % 480).toInt + 1
        val payload = (id % 3) match {
          case 0 => encodePng(w, h, data)
          case 1 => encodeJpeg(w, h, data)
          case _ => encodeWav(8000 + (nChars % 8).toInt * 1000, (id % 2).toInt + 1, data)
        }
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "image" else "audio"
        MediaRecord(id, payload, MediaMeta(kind, payload.length.toLong, w, h))
      }
  }

  // ---- container encoders (pure JVM, deterministic) ----

  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be16(v: Int): Array[Byte] =
    Array[Byte]((v >>> 8).toByte, v.toByte)

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte)

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val typeBytes = chunkType.getBytes("US-ASCII")
    crc.update(typeBytes); crc.update(data)
    be32(data.length) ++ typeBytes ++ data ++ be32(crc.getValue.toInt)
  }

  private[graft] def encodePng(w: Int, h: Int, data: Array[Byte]): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // IHDR: width, height, bit depth 8, color type 2 (truecolor), no
    // compression/filter/interlace flags beyond the mandatory zeros
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", data) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  private[graft] def encodeJpeg(w: Int, h: Int, data: Array[Byte]): Array[Byte] = {
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    // APP0/JFIF: length 16, identifier, version 1.1, no thumbnail
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    // DQT: a 64-entry table of ones — present so SOF is NOT at a fixed
    // offset and a parser must genuinely walk segments
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(67) ++
      Array[Byte](0) ++ Array.fill[Byte](64)(1)
    // SOF0 (baseline): precision 8, height, width, 1 component
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0)
    // SOS header then entropy-coded stand-in data, then EOI
    val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(8) ++
      Array[Byte](1, 1, 0, 0, 0x3f, 0)
    soi ++ app0 ++ dqt ++ sof0 ++ sos ++ data ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  private[graft] def encodeWav(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val bitsPerSample = 16
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(blockAlign) ++ le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  // ---- header parser (pure JVM, deterministic, magic-byte driven) ----

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Detect the container from magic bytes and extract its header
    * metadata by walking the REAL byte structure: PNG IHDR (with CRC
    * verification), JPEG marker-segment walk to SOF0-SOF15, WAV RIFF
    * chunk walk to `fmt `. Returns fmt "unknown" (all-null fields) for
    * anything unrecognized or truncated — never throws on junk bytes,
    * the contract a 100 TB crawl corpus demands.
    */
  private[graft] def parseMediaDims(b: Array[Byte]): (String, Option[Int], Option[Int], Option[Int], Option[Int]) = {
    def unknown = ("unknown", None, None, None, None)
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      // PNG: first chunk must be IHDR; verify its CRC before trusting dims
      val len = readBe32(b, 8)
      if (len != 13 || b.length < 8 + 4 + 4 + 13 + 4) return unknown
      val typeOk = b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
      if (!typeOk) return unknown
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      if (crc.getValue.toInt != readBe32(b, 8 + 4 + 4 + 13)) return unknown
      ("png", Some(readBe32(b, 16)), Some(readBe32(b, 20)), None, None)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk FF-marker segments until a start-of-frame (C0-CF minus
      // the non-frame C4/C8/CC); height/width live at +3/+5 past length
      var i = 2
      while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        val segLen = readBe16(b, i + 2)
        if (isSof) {
          if (i + 2 + 2 + 5 > b.length) return unknown
          return ("jpeg", Some(readBe16(b, i + 7)), Some(readBe16(b, i + 5)), None, None)
        }
        if (segLen < 2) return unknown
        i += 2 + segLen
      }
      unknown
    } else if (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // WAV: walk RIFF chunks to `fmt ` (not a fixed offset — real files
      // can carry LIST/INFO chunks first)
      var i = 12
      while (i + 8 <= b.length) {
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
        val size = readLe32(b, i + 4)
        if (isFmt) {
          if (i + 8 + 8 > b.length) return unknown
          return ("wav", None, None,
            Some(readLe32(b, i + 12)), Some(readLe16(b, i + 10)))
        }
        if (size < 0) return unknown
        i += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      unknown
    } else unknown
  }

  /** Media EXTENT from the real container bytes: the content-volume
    * number every curation budget needs — pixels (width×height) for
    * images, SAMPLE FRAMES and duration for audio. Unlike
    * [[parseMediaDims]] (header fields only), the WAV branch must also
    * walk to the `data` chunk and read its SIZE, then derive
    * duration_ms = data_bytes·1000 div byte_rate and frames =
    * data_bytes div block_align from the fmt chunk's own rate/channels
    * /bits — all integer arithmetic over parsed bytes, so the analytic
    * oracle certifies the full two-chunk walk. Returns (fmt, extent,
    * duration_ms): extent = pixels | frames, duration null for images,
    * all-null for parser rejects.
    */
  private[graft] def parseMediaExtent(b: Array[Byte]): (String, Option[Long], Option[Long]) = {
    val (fmt, w, h, _, _) = parseMediaDims(b)
    fmt match {
      case "png" | "jpeg" =>
        (fmt, for { ww <- w; hh <- h } yield ww.toLong * hh.toLong, None)
      case "wav" =>
        // second RIFF walk: fmt chunk (byteRate at +16, blockAlign at
        // +20 within the chunk body) and the data chunk's size field
        var i = 12
        var byteRate = 0L
        var blockAlign = 0L
        var dataSize = -1L
        while (i + 8 <= b.length && (byteRate == 0L || dataSize < 0L)) {
          val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
          val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
          val size = readLe32(b, i + 4)
          if (size < 0) return ("unknown", None, None)
          if (isFmt) {
            if (i + 8 + 16 > b.length) return ("unknown", None, None)
            byteRate = readLe32(b, i + 16).toLong
            blockAlign = readLe16(b, i + 20).toLong
          }
          if (isData) dataSize = size.toLong
          i += 8 + size + (size & 1)
        }
        if (byteRate <= 0L || blockAlign <= 0L || dataSize < 0L)
          ("unknown", None, None)
        else
          ("wav", Some(dataSize / blockAlign),
            Some(dataSize * 1000L / byteRate))
      case _ => ("unknown", None, None)
    }
  }

  /** Extent extraction as a registered query — the oracle computes the
    * expected pixels/frames/duration analytically from (doc_id,
    * n_chars) while the Spark side walks the real PNG/JPEG/WAV bytes.
    */
  def extentQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaWithHeaders(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val (fmt, extent, durMs) = parseMediaExtent(r.payload)
          (r.media_id, fmt, extent, durMs)
        }
      }
      .toDF("media_id", "fmt", "extent", "duration_ms")
      .orderBy("media_id")
  }

  /** Extract the CONTENT (data section) from a real container: PNG IDAT
    * chunk bytes (concatenated across chunks — real encoders split
    * IDAT), JPEG entropy-coded bytes between the SOS header and EOI,
    * WAV data chunk bytes. The inverse of the encoders above, walking
    * the same genuine byte structure; None for anything unrecognized
    * or truncated (never throws — the crawl contract).
    */
  private[graft] def extractContent(b: Array[Byte]): Option[Array[Byte]] = {
    val (fmt, _, _, _, _) = parseMediaDims(b)
    fmt match {
      case "png" =>
        val out = new java.io.ByteArrayOutputStream()
        var i = 8
        var ok = true
        var iendSeen = false
        // content is complete only if the walk reaches IEND — a partial
        // download whose tail chunk is cut off must NOT fingerprint as
        // the full content
        while (ok && !iendSeen && i + 8 <= b.length) {
          val len = readBe32(b, i)
          if (len < 0 || i + 8 + len + 4 > b.length) ok = false
          else {
            val isIdat = b(i + 4) == 'I' && b(i + 5) == 'D' &&
              b(i + 6) == 'A' && b(i + 7) == 'T'
            val isIend = b(i + 4) == 'I' && b(i + 5) == 'E' &&
              b(i + 6) == 'N' && b(i + 7) == 'D'
            if (isIdat) out.write(b, i + 8, len)
            if (isIend) iendSeen = true
            i += 8 + len + 4
          }
        }
        if (ok && iendSeen) Some(out.toByteArray) else None
      case "jpeg" =>
        // walk marker segments to SOS; content = after the SOS header,
        // up to (not including) the trailing EOI
        var i = 2
        while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
          val marker = b(i + 1) & 0xff
          val segLen = readBe16(b, i + 2)
          if (segLen < 2) return None
          if (marker == 0xda) {
            val start = i + 2 + segLen
            val end = b.length - 2
            if (start > end || (b(end) & 0xff) != 0xff ||
              (b(end + 1) & 0xff) != 0xd9) return None
            return Some(java.util.Arrays.copyOfRange(b, start, end))
          }
          i += 2 + segLen
        }
        None
      case "wav" =>
        var i = 12
        while (i + 8 <= b.length) {
          val isData = b(i) == 'd' && b(i + 1) == 'a' &&
            b(i + 2) == 't' && b(i + 3) == 'a'
          val size = readLe32(b, i + 4)
          if (size < 0) return None
          if (isData) {
            if (i + 8 + size > b.length) return None
            return Some(java.util.Arrays.copyOfRange(b, i + 8, i + 8 + size))
          }
          i += 8 + size + (size & 1)
        }
        None
      case _ => None
    }
  }

  /** CROSS-FORMAT content dedup: the same content re-containered (a PNG
    * and a WAV wrapping identical bytes) is invisible to the payload-
    * level face — near-dup blocks on kind and the container headers
    * shift every byte statistic. This row extracts the content section
    * from the REAL container bytes ([[extractContent]]) and fingerprints
    * it (Catalyst md5 — codegen, the md5-twin oracle convention), so
    * exact content dups group ACROSS formats: group id = smallest
    * member, canonical = the group root. The oracle fingerprints the
    * same bytes analytically (the data section carries exactly the
    * UTF-8 text), so a hash match certifies the extraction walk.
    *
    * Scale shape: extraction is map-side in the scan task; the only
    * exchange is the window over content_md5 partitions (bounded by dup
    * multiplicity, never single-partition); payloads never shuffle.
    */
  def contentDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("content_md5")
    mediaWithHeaders(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val (fmt, _, _, _, _) = parseMediaDims(r.payload)
          (r.media_id, fmt, extractContent(r.payload))
        }
      }
      .toDF("media_id", "fmt", "content")
      .withColumn("content_md5", md5(col("content")))
      .select(col("media_id"), col("fmt"), col("content_md5"),
        min(col("media_id")).over(w).as("group_id"),
        count(lit(1)).over(w).as("group_size"),
        (col("media_id") === min(col("media_id")).over(w)).as("is_canonical"))
      .orderBy("media_id")
  }

  /** Header-metadata extraction as a registered query: synthesize real
    * containers, parse them back from bytes. The fmt column comes from
    * MAGIC BYTES, dims from the parsed header — nothing is passed through
    * from the synthesis side, so the oracle hash-compare certifies the
    * whole decode path.
    */
  def dimsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaWithHeaders(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val (fmt, w, h, sr, ch) = parseMediaDims(r.payload)
          MediaDims(r.media_id, fmt, w, h, sr, ch)
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Metadata-only scan — the payload column must be pruned at the source.
    * Oracle-able: byte length of the UTF-8 payload.
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(col("text"), 1, 16).as("head16"))
      .orderBy("doc_id")

  /** Feature-extraction end-to-end as a registered query: manufacture →
    * decode(stub) → fixed-dim features, one row per record.
    */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame =
    decodeToFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy("media_id")

  /** Frame-sampling end-to-end as a registered query. */
  def frameQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, sfDir))
      .orderBy("media_id", "frame_idx")

  /** The SEGMENTED fixed-point feature face plus payload length — the
    * shared input of the near-dup operators: one decode pass emitting
    * (media_id, kind, n_bytes, ffix[8]) where ffix(s) is the mean byte
    * value of payload SEGMENT s (byte i belongs to segment i·8 div n —
    * 8 near-equal ranges), fixed-pointed as sum·10⁶ div count. This is
    * the coarse perceptual-hash shape: per-REGION statistics, so two
    * payloads only face-match when their bytes agree POSITIONALLY, not
    * merely in global value distribution — the whole-payload histogram
    * face this replaced made TRUE pair mass quasi-quadratic on a
    * same-language corpus (every same-length doc had a near-identical
    * histogram); segment means separate planted near-dups (L1 ≤ ~3.5
    * mean-byte units, measured) from background (≥ ~4) cleanly.
    *
    * The fix chain is PURE INTEGER (sum·1000000 div count, both operands
    * nonneg) — floor division matches DuckDB's `//` exactly, no IEEE
    * rounding contract needed; empty segments (n < 8) emit 0, the value
    * the oracle's COALESCE supplies for its missing groups.
    */
  private[graft] def featureFace(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val n = r.payload.length
          val sums = new Array[Long](8)
          val cnts = new Array[Long](8)
          var i = 0
          while (i < n) {
            val s = (i.toLong * 8L / n.toLong).toInt
            sums(s) += (r.payload(i) & 0xFF).toLong
            cnts(s) += 1L
            i += 1
          }
          val fix = Array.tabulate(8) { s =>
            if (cnts(s) == 0L) 0L else sums(s) * 1000000L / cnts(s)
          }
          (r.media_id, r.meta.kind, n.toLong, fix)
        }
      }
      .toDF("media_id", "kind", "n_bytes", "ffix")
  }

  /** The face itself as an oracled row: one row per (media, segment),
    * integer fix values — the DuckDB replay walks the same bytes via
    * hex-pair slicing, so the hash match certifies the segment mapping
    * and the integer fix chain end-to-end (the mm_features_fix
    * convention, applied to the face the near-dup family actually
    * joins on).
    */
  def faceSegmentsQuery(spark: SparkSession, sfDir: String): DataFrame =
    featureFace(spark, sfDir)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("ffix")).as(Seq("seg", "ffix")))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("seg").cast("int").as("seg"), col("ffix"))
      .orderBy("media_id", "seg")

  /** MULTIMODAL NEAR-DUP PAIRS — the dedup operator the text side has
    * had since round 4, over the media face: two payloads are near-dups
    * when they are the same SIZE up to `lenWindow` bytes (a re-encode /
    * re-container of the same media lands within a small byte delta)
    * AND their segment-mean faces are within `threshold` fixed-point L1
    * (4 mean-byte units total across the 8 segments at the default —
    * measured on the corpus: planted near-dups sit ≤ ~3.5 units,
    * background starts ≥ ~4; a real deployment swaps the segment means
    * for perceptual-hash / embedding features and keeps every join
    * below unchanged).
    *
    * Candidates come from a LOSSLESS triple-banded blocking, never all
    * pairs — the AND-composed pigeonhole (see [[BandTriples]]): at most
    * 3 of the 8 coordinates of a qualifying pair can exceed T/4, so one
    * of the two fixed 4-coordinate groups contains a fully-tight
    * leave-one-out TRIPLE; banding the 8 triples at per-coordinate
    * width T/4 (cells q and q+1, jointly with the quantized length)
    * guarantees a collision while requiring candidates to be tight in
    * three coordinates AT ONCE. The all-pairs DuckDB oracle re-proves
    * exactly this losslessness every round (the dedup_jaccard_prefix
    * adjudication convention), and the AND-composition is what keeps
    * the ×N probe cut's cross-copy mass out of the candidate exchange:
    * the scaler's per-copy Caesar shift moves every segment mean by
    * ~0.77 units per rotation step, so three simultaneous 1-unit
    * windows reject the rotated twins wholesale.
    *
    * Scale shape: 128 thin keys per media (8 bands × 2⁴ q/q+1
    * emissions); candidates are Σ cell² over the per-band joint
    * (kind, size, triple) grids — cubed per-coordinate selectivity.
    * Feature arrays never ride the candidate exchange: the verify joins
    * are ceiling-gated broadcasts (shuffle-hash past it — the
    * verify-join convention), and the L1 is one codegen'd
    * zip_with/aggregate over 8 longs per candidate row.
    */
  def nearDupPairs(
      spark: SparkSession,
      sfDir: String,
      lenWindow: Long = NearDupLenWindow,
      threshold: Long = NearDupL1Threshold): DataFrame =
    nearDupPairsOver(
      featureFace(spark, sfDir).localCheckpoint(), lenWindow, threshold)
      .orderBy("media_a", "media_b")

  /** The lossless TRIPLE-banded blocking keys of a face slice — the
    * AND-composed pigeonhole. Single-coordinate bands were lossless but
    * not selective on a byte-homogeneous corpus (per-coordinate windows
    * admit ~2% of the same-kind length-window base; at ×10 the band
    * join emitted >100M rows and WAS the wall). The sharper pigeonhole:
    * if Σ|Δseg| ≤ T over 8 segments then at most 3 coordinates have
    * |Δ| > T/4 (four violators would already sum past T). Split the
    * coordinates into two fixed groups of 4 — {0,1,2,3} and {4,5,6,7} —
    * and ≤3 violators means ONE group holds ≤1 of them, i.e. ≥3 of its
    * 4 coordinates are tight at T/4; that group contains a fully-tight
    * TRIPLE among its four leave-one-out triples. Banding the 8 triples
    * (4 per group), each keyed by its 3 coordinate cells at width T/4
    * jointly with the quantized length (q and q+1 per numeric
    * dimension: 16 emissions per band, 128 thin rows per media),
    * guarantees a qualifying pair collides on at least one band — and a
    * candidate must now be tight in THREE coordinates at once, cubing
    * the per-band selectivity (measured ×10: band-join output 112M →
    * well under 1M rows).
    *
    * Modality stays an EQUALITY dimension (images dedup against
    * images, never audio). Key rows CARRY n_bytes and the triple's
    * exact feature values so the true per-dimension windows (|Δn| ≤
    * lenWindow, each |Δf| ≤ T/4 — all implied for the guaranteed band)
    * apply as join predicates instead of relying on cell adjacency,
    * which over-admits ~4× per dimension.
    */
  private[graft] def bandWidthOf(threshold: Long): Long =
    math.max(threshold / 4L, 1L)

  /** The 8 leave-one-out triples: band id → the 3 segment indices it
    * keys on. Bands 0-3 cover group {0,1,2,3}, bands 4-7 group
    * {4,5,6,7}; band g*4+t drops the t-th member of group g.
    */
  private[graft] val BandTriples: Seq[(Int, Seq[Int])] = for {
    (group, gi) <- Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 7)).zipWithIndex
    (dropped, ti) <- group.zipWithIndex
  } yield (gi * 4 + ti, group.filterNot(_ == dropped))

  private def blockKeys(
      face: DataFrame,
      lenWindow: Long,
      threshold: Long): DataFrame = {
    val w = bandWidthOf(threshold)
    val frames = BandTriples.map { case (bandId, coords) =>
      face.select(col("media_id"), col("kind"), col("n_bytes"),
          lit(bandId).as("band"),
          expr(s"n_bytes div ${lenWindow}L").as("lq"),
          element_at(col("ffix"), coords(0) + 1).as("f0"),
          element_at(col("ffix"), coords(1) + 1).as("f1"),
          element_at(col("ffix"), coords(2) + 1).as("f2"))
        .withColumn("dl", explode(array(lit(0L), lit(1L))))
        .withColumn("d0", explode(array(lit(0L), lit(1L))))
        .withColumn("d1", explode(array(lit(0L), lit(1L))))
        .withColumn("d2", explode(array(lit(0L), lit(1L))))
        .select(col("media_id"), col("kind"), col("band"),
          (col("lq") + col("dl")).as("k_len"),
          (expr(s"f0 div ${w}L") + col("d0")).as("c0"),
          (expr(s"f1 div ${w}L") + col("d1")).as("c1"),
          (expr(s"f2 div ${w}L") + col("d2")).as("c2"),
          col("n_bytes"), col("f0"), col("f1"), col("f2"))
    }
    frames.reduce(_ unionAll _)
  }

  /** The pair core over an already-checkpointed face — shared by the
    * pairs row (sorted presentation) and the decision row (feeds the
    * component contraction unsorted).
    *
    * VERIFY-FIRST shuffle economics: candidates keep their band
    * multiplicity (≤ 16 per band × 8 bands, output-bounded) through the
    * cheap codegen'd L1 verify, and only the verified survivors —
    * output-scale, not candidate-scale — pay a distinct. The first cut
    * distinct'd the raw candidates instead, and on a byte-homogeneous
    * corpus whose single-coordinate cells are hot that one exchange
    * (tens of millions of thin rows at ×10) WAS the query: ×10 wall
    * 97 s → verify-first 44 s → triple bands + in-join exact windows
    * make both the exchange and the verify output-bounded. The verify
    * joins stay ceiling-gated (broadcast under the Dedup ceiling,
    * shuffle-hash past it), so the multiplicity never rides a sort.
    */
  private def nearDupPairsOver(
      face: DataFrame,
      lenWindow: Long,
      threshold: Long): DataFrame = {
    val nFace = face.count()
    val bandWidth = bandWidthOf(threshold)
    // shuffle-hash, not sort-merge: the band key join needs no order,
    // and sorting 2×|keys| thin rows is pure overhead at every scale
    val keys = blockKeys(face, lenWindow, threshold)
    val cand = keys.as("x").hint("shuffle_hash").join(keys.as("y"),
        col("x.kind") === col("y.kind") &&
          col("x.band") === col("y.band") &&
          col("x.k_len") === col("y.k_len") &&
          col("x.c0") === col("y.c0") &&
          col("x.c1") === col("y.c1") &&
          col("x.c2") === col("y.c2") &&
          col("x.media_id") < col("y.media_id") &&
          abs(col("x.n_bytes") - col("y.n_bytes")) <= lenWindow &&
          abs(col("x.f0") - col("y.f0")) <= bandWidth &&
          abs(col("x.f1") - col("y.f1")) <= bandWidth &&
          abs(col("x.f2") - col("y.f2")) <= bandWidth)
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        col("x.kind").as("kind"))
    def gate(df: DataFrame): DataFrame =
      if (nFace <= Dedup.VerifySetBroadcastCeiling) broadcast(df)
      else df.hint("shuffle_hash")
    cand
      .join(gate(face.select(col("media_id").as("media_a"),
        col("n_bytes").as("la"), col("ffix").as("fa"))), "media_a")
      .join(gate(face.select(col("media_id").as("media_b"),
        col("n_bytes").as("lb"), col("ffix").as("fb"))), "media_b")
      .select(col("media_a"), col("media_b"), col("kind"),
        abs(col("la") - col("lb")).as("len_delta"),
        aggregate(zip_with(col("fa"), col("fb"), (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x).as("l1_fix"))
      .filter(col("len_delta") <= lenWindow && col("l1_fix") <= threshold)
      .distinct()
  }

  /** The FIDELITY of each media item, read off the REAL parsed headers:
    * the media corpus is re-synthesized with genuine PNG/JPEG/WAV
    * containers ([[mediaWithHeaders]]), each payload's header walked by
    * [[parseMediaDims]] (magic bytes → IHDR/SOF0/fmt chunk), and the
    * fidelity derived from what the PARSE returned — width×height for
    * images, sample_rate×channels for audio, payload bytes as the
    * fallback for anything the parser rejects. Nothing passes through
    * from the synthesis side: a parser regression flips fidelities to
    * the fallback and the analytic oracle catches the hash drift.
    *
    * Scale shape: map-side only — one header walk per payload inside
    * the scan task, emitting an 8-byte fidelity per media; payloads
    * never shuffle.
    */
  private[graft] def fidelityFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaWithHeaders(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val (fmt, w, h, sr, ch) = parseMediaDims(r.payload)
          val fid = fmt match {
            case "png" | "jpeg" =>
              (for { ww <- w; hh <- h } yield ww.toLong * hh.toLong)
                .getOrElse(r.meta.sizeBytes)
            case "wav" =>
              (for { s <- sr; c <- ch } yield s.toLong * c.toLong)
                .getOrElse(r.meta.sizeBytes)
            case _ => r.meta.sizeBytes
          }
          (r.media_id, fmt, fid)
        }
      }
      .toDF("media_id", "fmt", "fidelity")
  }

  /** The media DEDUP DECISION: connected components over the near-dup
    * pair graph (the Cluster star-contraction — singletons self-rooted,
    * component id = smallest member), cluster size, and the keep flag.
    * Unlike text dedup (which keeps the lowest id / best quality
    * score), media dedup keeps the HIGHEST-FIDELITY copy — fidelity
    * comes from [[fidelityFrame]]'s REAL header parse (width×height
    * for images, sample-rate×channels for audio, payload bytes as the
    * parser-reject fallback), ties to the lowest id. `filter(keep)` is
    * the deduplicated media corpus; the drop list stays auditable, the
    * text-dedup convention.
    *
    * Scale shape: the pair core above (lossless blocking, never
    * all-pairs) feeds the same star-contraction loop the text
    * components use ((long, long) edges only); the decision windows
    * partition BY COMPONENT — never single-partition; the fidelity
    * join is by media_id on two aggregate-thin frames.
    */
  def nearDupDecision(
      spark: SparkSession,
      sfDir: String,
      lenWindow: Long = NearDupLenWindow,
      threshold: Long = NearDupL1Threshold): DataFrame = {
    val face = featureFace(spark, sfDir).localCheckpoint()
    val pairs = nearDupPairsOver(face, lenWindow, threshold)
    val comp = Cluster.connectedComponents(pairs, "media_a", "media_b")
      .withColumnRenamed("node", "media_id")
    val base = face.select("media_id", "n_bytes")
      .join(fidelityFrame(spark, sfDir).select("media_id", "fidelity"),
        Seq("media_id"))
      .join(comp, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("component"), col("media_id")).as("component_id"),
        col("n_bytes"), col("fidelity"))
    val wC = Window.partitionBy("component_id")
    val wK = Window.partitionBy("component_id")
      .orderBy(desc("fidelity"), asc("media_id"))
    base
      .withColumn("cluster_size", count(lit(1)).over(wC))
      .withColumn("keep", row_number().over(wK) === 1)
      .select("media_id", "component_id", "cluster_size", "n_bytes",
        "fidelity", "keep")
      .orderBy("media_id")
  }

  /** INCREMENTAL media near-dup — the per-batch serve shape every other
    * dedup family already has (the %10 carve convention): each batch
    * media (media_id % 10 == 0) is checked against the CORPUS slice
    * only, emitting its best corpus match (smallest L1, ties to the
    * lowest corpus id) or is_new when nothing sits within both windows.
    * Candidates come from the same lossless q/q+1 blocking, asymmetric:
    * batch keys join corpus keys, so the batch pays ~|batch| × cell
    * occupancy, never |batch| × |corpus|.
    */
  def incrementalNearDup(
      spark: SparkSession,
      sfDir: String,
      lenWindow: Long = NearDupLenWindow,
      threshold: Long = NearDupL1Threshold): DataFrame = {
    val face = featureFace(spark, sfDir).localCheckpoint()
    val batch = face.filter(col("media_id") % 10 === 0)
    val corpus = face.filter(col("media_id") % 10 =!= 0)
    incrementalNearDupFrames(batch, corpus, face, lenWindow, threshold)
  }

  /** The serve core of [[incrementalNearDup]] over explicit frames —
    * shared with the streaming twin, whose micro-batches each carry a
    * slice of the batch face. `full` is the checkpointed union the
    * ceiling-gated verify joins read (batch ∪ corpus in the batch row;
    * the primed full face in the stream).
    */
  private[graft] def incrementalNearDupFrames(
      batch: DataFrame,
      corpus: DataFrame,
      full: DataFrame,
      lenWindow: Long,
      threshold: Long): DataFrame = {
    val nFace = full.count()
    val face = full
    val bandWidth = bandWidthOf(threshold)
    // verify-first like the pairs core: candidates keep band
    // multiplicity (the row_number best-match is multiplicity-blind),
    // exact per-dimension windows apply inside the join
    val cand = blockKeys(batch, lenWindow, threshold)
      .select(col("media_id").as("media_id_b"), col("kind"), col("band"),
        col("k_len"), col("c0"), col("c1"), col("c2"),
        col("n_bytes").as("nb"),
        col("f0").as("bf0"), col("f1").as("bf1"), col("f2").as("bf2"))
      .hint("shuffle_hash")
      .join(blockKeys(corpus, lenWindow, threshold)
          .select(col("media_id").as("corpus_id"), col("kind"), col("band"),
            col("k_len"), col("c0"), col("c1"), col("c2"),
            col("n_bytes").as("nc"),
            col("f0").as("cf0"), col("f1").as("cf1"), col("f2").as("cf2")),
        Seq("kind", "band", "k_len", "c0", "c1", "c2"))
      .filter(abs(col("nb") - col("nc")) <= lenWindow &&
        abs(col("bf0") - col("cf0")) <= bandWidth &&
        abs(col("bf1") - col("cf1")) <= bandWidth &&
        abs(col("bf2") - col("cf2")) <= bandWidth)
      .select("media_id_b", "corpus_id")
      .withColumnRenamed("media_id_b", "media_id")
    def gate(df: DataFrame): DataFrame =
      if (nFace <= Dedup.VerifySetBroadcastCeiling) broadcast(df)
      else df.hint("shuffle_hash")
    val scored = cand
      .join(gate(face.select(col("media_id"),
        col("n_bytes").as("la"), col("ffix").as("fa"))), "media_id")
      .join(gate(face.select(col("media_id").as("corpus_id"),
        col("n_bytes").as("lb"), col("ffix").as("fb"))), "corpus_id")
      .select(col("media_id"), col("corpus_id"),
        abs(col("la") - col("lb")).as("len_delta"),
        aggregate(zip_with(col("fa"), col("fb"), (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x).as("l1_fix"))
      .filter(col("len_delta") <= lenWindow && col("l1_fix") <= threshold)
    val wB = Window.partitionBy("media_id")
      .orderBy(asc("l1_fix"), asc("corpus_id"))
    val best = scored.withColumn("rn", row_number().over(wB))
      .filter(col("rn") === 1)
      .select(col("media_id"), col("corpus_id"), col("l1_fix"))
    batch.select("media_id")
      .join(best, Seq("media_id"), "left")
      .select(col("media_id"), col("corpus_id").isNull.as("is_new"),
        col("corpus_id").as("dup_of"), col("l1_fix"))
      .orderBy("media_id")
  }

  /** Streaming twin of [[incrementalNearDup]] — the media-ingest
    * analogue of `Similarity.embIngestStream`: arriving media_id
    * micro-batches get verdict rows against the SAME corpus face slice
    * (media_id % 10 ≠ 0), written idempotently per batch id
    * (re-running a micro-batch overwrites its own directory, never
    * duplicates — the foreachBatch sink convention). The face is
    * checkpointed EAGERLY before `.start()` so micro-batch 0 never
    * pays the corpus-scale decode (the ingest-gate lesson); each batch
    * then pays only its own blocking keys × corpus cell occupancy.
    */
  def mediaIngestStream(
      spark: SparkSession,
      sfDir: String,
      arrivals: DataFrame,
      outDir: String,
      lenWindow: Long = NearDupLenWindow,
      threshold: Long = NearDupL1Threshold): org.apache.spark.sql.streaming.StreamingQuery = {
    val face = featureFace(spark, sfDir).localCheckpoint()
    val corpus = face.filter(col("media_id") % 10 =!= 0).localCheckpoint()
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchFace = face.join(
          broadcast(batch.select(col("media_id"))), Seq("media_id"), "left_semi")
        incrementalNearDupFrames(batchFace, corpus, face, lenWindow, threshold)
          .write.mode("overwrite")
          .parquet(s"$outDir/verdicts/batch_id=$batchId")
        ()
      }
      .start()
  }

  case class HistBin(media_id: Long, kind: String, bin: Int, cnt: Long, n_bytes: Long)

  /** The byte-histogram feature extraction with an ORACLE-EXACT face:
    * per media record, the non-empty bins of the 8-bin byte-value
    * histogram as INTEGER counts plus the payload length — the same
    * decode pass as [[decodeToFeatures]] minus the float normalization
    * (count/len as float is what kept mm_features oracle-less: the two
    * engines format/round floats differently in an array, while integer
    * counts hash exactly; the normalized form is cnt/n_bytes, recoverable
    * by the consumer). The DuckDB replay walks the UTF-8 payload bytes
    * via hex-pair slicing, so a hash match certifies the byte loop.
    */
  def featureHistQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, sfDir)
      .mapPartitions { it =>
        it.flatMap { r =>
          val hist = new Array[Long](8)
          var i = 0
          while (i < r.payload.length) {
            hist((r.payload(i) & 0xFF) >> 5) += 1L
            i += 1
          }
          (0 until 8).iterator
            .filter(hist(_) > 0)
            .map(b => HistBin(r.media_id, r.meta.kind, b, hist(b), r.payload.length.toLong))
        }
      }
      .toDF()
      .orderBy("media_id", "bin")
  }
}
