package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque `binary` columns with typed metadata, and per-record feature
  * extraction runs batch-wise in `mapPartitions` (the Scala analogue of a
  * batched pandas UDF — one partition = one decode batch).
  *
  * PNG payloads are decoded FOR REAL (IHDR is fixed-offset by spec — see
  * `decode`); every other media type falls back to a clearly-marked STUB
  * (no other codecs in this environment) deriving deterministic
  * pseudo-dimensions from the first payload bytes. The Spark-side plumbing
  * — schema, binary transport, partition-batched extraction, checksum — is
  * real and oracle-checked either way.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (thumb_* model a resize step at half resolution). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      thumb_w: Int,
      thumb_h: Int,
      sha: String)

  /** STUB decode: a real implementation would parse the container header
    * (JPEG/WAV/...). Deterministic fake: dimensions from the first two
    * payload bytes, 3 channels. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (payload(0) & 0xff, payload(1) & 0xff, 3)

  /** PNG 8-byte signature (PNG spec §5.2 — public, png.org/spec). */
  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Samples-per-pixel by PNG color type (spec §11.2.2 / table 11.1). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolor
    case 3 => 1 // indexed
    case 4 => 2 // greyscale + alpha
    case 6 => 4 // truecolor + alpha
    case _ => 0
  }

  /** Decode (width, height, channels). PNG payloads are parsed FOR REAL:
    * the spec mandates IHDR as the first chunk, so width/height are the
    * big-endian u32s at offsets 16/20 and channels derive from the color
    * type at offset 25 (spec §11.2.2). Every other media type falls back to
    * the declared deterministic stub — no other codecs in this container. */
  def decode(payload: Array[Byte]): (Int, Int, Int) =
    if (payload.length >= 26 && payload.startsWith(PngSig)) {
      def be32(o: Int): Int =
        (payload(o) & 0xff) << 24 | (payload(o + 1) & 0xff) << 16 |
          (payload(o + 2) & 0xff) << 8 | (payload(o + 3) & 0xff)
      (be32(16), be32(20), pngChannels(payload(25) & 0xff))
    } else decodeStub(payload)

  /** Synthesize a minimal valid PNG prefix — signature + IHDR chunk with a
    * real CRC-32 (spec §5.3) — enough for any header-reading decoder. Test
    * fixture for the real decode path above. */
  def pngHeader(width: Int, height: Int, colorType: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33)
    buf.put(PngSig)
    buf.putInt(13) // IHDR data length
    val crcFrom = buf.position()
    buf.put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(8.toByte).put(colorType.toByte) // bit depth, color type
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val crc = new java.util.zip.CRC32()
    crc.update(buf.array(), crcFrom, 17)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** Partition-batched feature extraction. On a cluster each partition is
    * one decode batch; the MessageDigest is allocated once per batch, not
    * per row. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, c) = decode(r.payload)
        digest.reset()
        MediaFeatures(r.doc_id, r.payload.length, w, h, c, w / 2, h / 2,
          hex(digest.digest(r.payload)))
      }
    }
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, sha: String)

  /** Frame sampling: treats the payload as a fixed-size frame container
    * (video-style) and emits every `stride`-th complete frame with its
    * digest — the 1-row→N-rows shape of real frame extraction, batched per
    * partition like extractFeatures. The "codec" is the same stub contract:
    * fixed `frameBytes` per frame instead of container parsing. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          digest.reset()
          val frame = java.util.Arrays.copyOfRange(
            r.payload, i * frameBytes, (i + 1) * frameBytes)
          Frame(r.doc_id, i, frameBytes, hex(digest.digest(frame)))
        }
      }
    }
  }

  val queries: Seq[Q] = Seq(
    // documents.text cast to binary stands in for the media payload; the
    // oracle recomputes the stub's arithmetic with ascii()/sha256().
    Q("q60_media_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id", lit("text/plain").as("media_type"),
            $"text".cast("binary").as("payload"))
          .as[MediaRecord]
        extractFeatures(records).toDF()
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  CAST(ascii(substr(text, 1, 1)) AS INT) AS width,
             |  CAST(ascii(substr(text, 2, 1)) AS INT) AS height,
             |  3 AS channels,
             |  CAST(ascii(substr(text, 1, 1)) // 2 AS INT) AS thumb_w,
             |  CAST(ascii(substr(text, 2, 1)) // 2 AS INT) AS thumb_h,
             |  sha256(text) AS sha
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // frame sampling over the same stand-in payloads: 256-byte frames,
    // every 4th one. ASCII text means the byte frames equal the char
    // substrings, so DuckDB reproduces the digests exactly.
    Q("q61_frame_sample",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id", lit("video/stub").as("media_type"),
            $"text".cast("binary").as("payload"))
          .as[MediaRecord]
        sampleFrames(records, frameBytes = 256, stride = 4).toDF()
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
             |    substr(text, i * 256 + 1, 256) AS frame
             |  FROM (SELECT doc_id, text,
             |          unnest(generate_series(0, CAST(length(text) // 256 AS INT) - 1, 4)) AS i
             |        FROM documents))
             |SELECT doc_id, frame_idx, 256 AS n_bytes, sha256(frame) AS sha
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    // the REAL decoder path: a valid PNG header (signature + IHDR + CRC) is
    // synthesized per document with dimensions derived from doc_id, and
    // extractFeatures must parse the binary back out. The oracle recomputes
    // the expected dimensions arithmetically — what's being checked is that
    // Spark's parse(build(w,h)) round-trips exactly. sha is dropped from
    // the projection only because DuckDB's sha256 can't take a BLOB.
    Q("q62_png_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map(id => MediaRecord(id, "image/png",
            pngHeader((id % 200).toInt + 1, (id % 100).toInt + 1, colorType = 2)))
        extractFeatures(records).toDF()
          .select($"doc_id", $"n_bytes", $"width", $"height", $"channels",
            $"thumb_w", $"thumb_h")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  33 AS n_bytes,
             |  CAST(doc_id % 200 + 1 AS INT) AS width,
             |  CAST(doc_id % 100 + 1 AS INT) AS height,
             |  3 AS channels,
             |  CAST((doc_id % 200 + 1) // 2 AS INT) AS thumb_w,
             |  CAST((doc_id % 100 + 1) // 2 AS INT) AS thumb_h
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
