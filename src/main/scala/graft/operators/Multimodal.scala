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

  /** The fixed-point feature face plus payload length — the shared
    * input of the near-dup operator: one decode pass emitting
    * (media_id, n_bytes, ffix[8]) where ffix is the mm_features_fix
    * convention (single-precision bin ratio, doubled, ×10⁶, HALF_UP —
    * the exact chain the oracled row pins, applied through the same
    * Catalyst `round` so the fix values are bit-identical to that row's).
    */
  private[graft] def featureFace(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Float](8)
          var i = 0
          while (i < r.payload.length) {
            hist((r.payload(i) & 0xFF) >> 5) += 1f
            i += 1
          }
          val n = math.max(r.payload.length, 1).toFloat
          (r.media_id, r.meta.kind, r.payload.length.toLong, hist.map(_ / n))
        }
      }
      .toDF("media_id", "kind", "n_bytes", "features")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        transform(col("features"),
          f => round(f.cast("double") * lit(1000000.0), 0).cast("long"))
          .as("ffix"))
  }

  /** MULTIMODAL NEAR-DUP PAIRS — the dedup operator the text side has
    * had since round 4, over the media face: two payloads are near-dups
    * when they are the same SIZE up to `lenWindow` bytes (a re-encode /
    * re-container of the same media lands within a small byte delta)
    * AND their fixed-point feature histograms are within `threshold`
    * L1 distance (0.05% total variation at the default — the
    * distribution face of the decode stub; a real deployment swaps the
    * histogram for perceptual-hash / embedding features and keeps every
    * join below unchanged).
    *
    * Candidates come from a LOSSLESS 2-D blocking, never all pairs:
    * quantize n_bytes at width `lenWindow` and one histogram coordinate
    * at width `threshold`, each media emitting cell q AND q+1 per
    * dimension (the dedup_fuzzy_lev length×affix convention). A
    * qualifying pair differs by ≤ window in BOTH coordinates (|Δbin|
    * ≤ L1 ≤ threshold), so its quantized cells differ by ≤ 1 per
    * dimension and the q/q+1 emissions must intersect on the joint key
    * — the all-pairs DuckDB oracle re-proves exactly this losslessness
    * every round (the dedup_jaccard_prefix adjudication convention).
    *
    * Scale shape: 4 thin keys per media; candidates are Σ cell² over
    * the joint (size, density) grid — the corpus' own diversity bounds
    * cell occupancy, and a pathologically uniform corpus degrades to
    * the same place every banded near-dup (minhash included) does.
    * Feature arrays never ride the candidate exchange: the verify joins
    * are ceiling-gated broadcasts (shuffle-hash past it — the
    * verify-join convention), and the L1 is one codegen'd
    * zip_with/aggregate over 8 longs per UNIQUE candidate.
    */
  def nearDupPairs(
      spark: SparkSession,
      sfDir: String,
      lenWindow: Long = 16L,
      threshold: Long = 500L): DataFrame =
    nearDupPairsOver(
      featureFace(spark, sfDir).localCheckpoint(), lenWindow, threshold)
      .orderBy("media_a", "media_b")

  /** The pair core over an already-checkpointed face — shared by the
    * pairs row (sorted presentation) and the decision row (feeds the
    * component contraction unsorted).
    */
  /** The lossless blocking keys of a face slice: 4 thin rows per media
    * over the (modality, size, density) grid — modality is an EQUALITY
    * dimension (a near-dup pair is always same-kind: images dedup
    * against images, never against audio), the two numeric dimensions
    * quantize at their window widths with q and q+1 emitted, so two
    * same-kind media within BOTH windows always share a joint key.
    */
  private def blockKeys(
      face: DataFrame,
      lenWindow: Long,
      threshold: Long): DataFrame =
    face.select(col("media_id"), col("kind"),
        expr(s"n_bytes div ${lenWindow}L").as("lq"),
        expr(s"element_at(ffix, 4) div ${threshold}L").as("hq"))
      .withColumn("dl", explode(array(lit(0L), lit(1L))))
      .withColumn("dh", explode(array(lit(0L), lit(1L))))
      .select(col("media_id"), col("kind"),
        (col("lq") + col("dl")).as("k_len"),
        (col("hq") + col("dh")).as("k_hist"))

  private def nearDupPairsOver(
      face: DataFrame,
      lenWindow: Long,
      threshold: Long): DataFrame = {
    val nFace = face.count()
    val keys = blockKeys(face, lenWindow, threshold)
    val cand = keys.as("x").join(keys.as("y"),
        col("x.kind") === col("y.kind") &&
          col("x.k_len") === col("y.k_len") &&
          col("x.k_hist") === col("y.k_hist") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        col("x.kind").as("kind"))
      .distinct()
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
  }

  /** The media DEDUP DECISION: connected components over the near-dup
    * pair graph (the Cluster star-contraction — singletons self-rooted,
    * component id = smallest member), cluster size, and the keep flag.
    * Unlike text dedup (which keeps the lowest id / best quality
    * score), media dedup keeps the HIGHEST-FIDELITY copy — the stand-in
    * fidelity signal is payload size (a real pipeline reads
    * width×height or bitrate off [[dimsQuery]]'s parsed headers), ties
    * to the lowest id. `filter(keep)` is the deduplicated media corpus;
    * the drop list stays auditable, the text-dedup convention.
    *
    * Scale shape: the pair core above (lossless blocking, never
    * all-pairs) feeds the same star-contraction loop the text
    * components use ((long, long) edges only); the decision windows
    * partition BY COMPONENT — never single-partition.
    */
  def nearDupDecision(
      spark: SparkSession,
      sfDir: String,
      lenWindow: Long = 16L,
      threshold: Long = 500L): DataFrame = {
    val face = featureFace(spark, sfDir).localCheckpoint()
    val pairs = nearDupPairsOver(face, lenWindow, threshold)
    val comp = Cluster.connectedComponents(pairs, "media_a", "media_b")
      .withColumnRenamed("node", "media_id")
    val base = face.select("media_id", "n_bytes")
      .join(comp, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("component"), col("media_id")).as("component_id"),
        col("n_bytes"))
    val wC = Window.partitionBy("component_id")
    val wK = Window.partitionBy("component_id")
      .orderBy(desc("n_bytes"), asc("media_id"))
    base
      .withColumn("cluster_size", count(lit(1)).over(wC))
      .withColumn("keep", row_number().over(wK) === 1)
      .select("media_id", "component_id", "cluster_size", "n_bytes", "keep")
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
      lenWindow: Long = 16L,
      threshold: Long = 500L): DataFrame = {
    val face = featureFace(spark, sfDir).localCheckpoint()
    val nFace = face.count()
    val batch = face.filter(col("media_id") % 10 === 0)
    val corpus = face.filter(col("media_id") % 10 =!= 0)
    val cand = blockKeys(batch, lenWindow, threshold)
      .withColumnRenamed("media_id", "media_id_b")
      .join(blockKeys(corpus, lenWindow, threshold)
        .withColumnRenamed("media_id", "corpus_id"),
        Seq("kind", "k_len", "k_hist"))
      .select("media_id_b", "corpus_id")
      .distinct()
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
