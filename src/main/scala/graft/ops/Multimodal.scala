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
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the audio modality, same real-decoder contract as q62: a canonical
    // 44-byte PCM WAV header (RIFF/WAVE + fmt + data chunks, little-endian
    // per the public RIFF spec) is synthesized per document and decodeWav
    // must parse channels/rate/width/duration back out of the binary. The
    // oracle recomputes the expected values arithmetically — the check is
    // that Spark's parse(build(...)) round-trips exactly, incl. the
    // integer-division duration.
    Q("q88_wav_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map { id =>
            val rate = 8000 * ((id % 5).toInt + 1)
            val ch = (id % 2).toInt + 1
            val bits = 8 * ((id % 2).toInt + 1)
            val n = ((id % 1000).toInt + 1) * 10
            MediaRecord(id, "audio/wav", wavHeader(rate, ch, bits, n))
          }
        extractAudio(records).toDF().orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  44 AS n_bytes,
             |  CAST(doc_id % 2 + 1 AS INT) AS channels,
             |  CAST(8000 * (doc_id % 5 + 1) AS INT) AS sample_rate,
             |  CAST(8 * (doc_id % 2 + 1) AS INT) AS bits,
             |  CAST((doc_id % 1000 + 1) * 10 AS BIGINT) AS n_samples,
             |  CAST(((doc_id % 1000 + 1) * 10 * 1000)
             |    // (8000 * (doc_id % 5 + 1)) AS BIGINT) AS duration_ms
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the JPEG modality, same real-decoder contract: a minimal valid JPEG
    // (SOI + APP0/JFIF + a VARIABLE-length COM segment + SOF0 + EOI, per
    // the public JPEG/JFIF specs) is synthesized per document and
    // decodeJpeg must WALK the marker stream — skipping segments by their
    // big-endian lengths, which the variable comment forces — to find SOF0
    // and parse precision/height/width/components. The oracle recomputes
    // the expectation arithmetically (n_bytes depends on the comment's
    // digit count), so the check is parse(build(...)) round-tripping
    // through a real segment walker, not fixed offsets.
    Q("q164_jpeg_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map(id => MediaRecord(id, "image/jpeg",
            jpegHeader((id % 400).toInt + 16, (id % 300).toInt + 9, s"doc:$id")))
        extractJpeg(records).toDF().orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(49 + length(CAST(doc_id AS VARCHAR)) AS INT) AS n_bytes,
             |  CAST(doc_id % 400 + 16 AS INT) AS width,
             |  CAST(doc_id % 300 + 9 AS INT) AS height,
             |  8 AS precision,
             |  3 AS n_components
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the video-container modality: a minimal valid MP4 (ftyp + a
    // variable-size free box + moov/mvhd, per the public ISO BMFF box
    // grammar) is synthesized per document and decodeMp4 must walk the
    // top-level box sequence by size/4CC — the free box's varying size
    // forces real walking — then descend into moov and parse the mvhd
    // timescale/duration into an integer duration. The oracle recomputes
    // everything arithmetically; this is the container-metadata step a
    // video corpus runs before any frame decode (which q61 models).
    Q("q165_mp4_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map { id =>
            val ts = 1000 * ((id % 4).toInt + 1)
            val dur = ((id % 5000).toInt + 1) * 100
            MediaRecord(id, "video/mp4", mp4Header(ts, dur, (id % 17).toInt))
          }
        extractMp4(records).toDF().orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(140 + doc_id % 17 AS INT) AS n_bytes,
             |  3 AS n_boxes,
             |  CAST(1000 * (doc_id % 4 + 1) AS BIGINT) AS timescale,
             |  CAST((doc_id % 5000 + 1) * 100 AS BIGINT) AS duration,
             |  CAST((doc_id % 5000 + 1) * 100 * 1000
             |    // (1000 * (doc_id % 4 + 1)) AS BIGINT) AS duration_ms
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the archive-container modality: datasets ship as tar bundles, and
    // the manifest walk (member names/sizes/offsets WITHOUT extracting)
    // is the first step of any ingest. A real POSIX ustar archive is
    // synthesized per document (1-3 members, octal size fields, REAL
    // header checksums, two-zero-block terminator) and decodeTar walks
    // the 512-byte block chain by parsed size — a wrong size, offset or
    // checksum breaks the hash. One output row per member.
    Q("q202_tar_manifest",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map(id => MediaRecord(id, "application/x-tar", tarArchive(id)))
        extractTar(records).toDF().orderBy($"doc_id", $"member_idx")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, t.k AS member_idx,
             |    (doc_id * 7 + t.k * 13) % 900 + 1 AS size
             |  FROM documents, generate_series(0, 2) AS t(k)
             |  WHERE t.k <= doc_id % 3),
             |o AS (
             |  SELECT doc_id, member_idx, size,
             |    512 + coalesce(sum(512 + 512 * ((size + 511) // 512))
             |      OVER (PARTITION BY doc_id ORDER BY member_idx
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS data_offset
             |  FROM m)
             |SELECT doc_id, CAST(member_idx AS INT) AS member_idx,
             |  'f' || member_idx || '.bin' AS name,
             |  CAST(size AS BIGINT) AS size,
             |  CAST(data_offset AS BIGINT) AS data_offset,
             |  TRUE AS cksum_ok
             |FROM o ORDER BY doc_id, member_idx""".stripMargin)),

    // the animated-image modality: GIF's logical screen descriptor is
    // little-endian (unlike PNG/JPEG's big-endian), so this exercises the
    // opposite byte order FOR REAL — version string, LE16 dimensions, and
    // the packed flags byte whose global-color-table bit decides whether
    // 3·2^(exp+1) palette bytes follow. decodeGif must honor the flag to
    // land on the trailer; n_bytes pins that it did.
    Q("q203_gif_features",
      (s, d) => {
        import s.implicits._
        val records = Tables.documents(s, d)
          .select($"doc_id").as[Long]
          .map { id =>
            MediaRecord(id, "image/gif", gifImage(GifSpec(
              id, id % 2 == 1, (id % 320).toInt + 1, (id % 240).toInt + 1,
              id % 4 != 0, (id % 8).toInt)))
          }
        extractGif(records).toDF().orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(13 + CASE WHEN doc_id % 4 = 0 THEN 0
             |    ELSE 3 * (1 << (CAST(doc_id AS INT) % 8 + 1)) END + 1 AS INT)
             |    AS n_bytes,
             |  CASE WHEN doc_id % 2 = 1 THEN '89a' ELSE '87a' END AS version,
             |  CAST(doc_id % 320 + 1 AS INT) AS width,
             |  CAST(doc_id % 240 + 1 AS INT) AS height,
             |  CAST(CASE WHEN doc_id % 4 = 0 THEN 0
             |    ELSE 1 << (CAST(doc_id AS INT) % 8 + 1) END AS INT) AS n_colors
             |FROM documents ORDER BY doc_id""".stripMargin))
  )

  /** Decoded audio-payload features. */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Int,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_samples: Long,
      duration_ms: Long)

  /** Synthesize the canonical 44-byte PCM WAV header (RIFF spec: all
    * multi-byte fields little-endian; fmt chunk of 16 bytes, audio format
    * 1 = PCM). `nSamples` sized the data chunk; no sample data follows —
    * enough for any header-reading decoder. */
  def wavHeader(sampleRate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * channels * (bits / 8)
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * channels * (bits / 8)) // byte rate
    buf.putShort((channels * (bits / 8)).toShort)  // block align
    buf.putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.array()
  }

  /** Parse the WAV header FOR REAL: fixed offsets in the canonical layout —
    * channels @22 (LE u16), sample rate @24 (LE u32), bits @34 (LE u16),
    * data size @40 (LE u32); n_samples = dataSize / (channels · bits/8),
    * duration = n_samples · 1000 / rate (integer ms). Non-WAV payloads get
    * the zero record rather than a throw (a firehose carries junk). */
  def decodeWav(doc_id: Long, p: Array[Byte]): AudioFeatures = {
    def le16(o: Int): Int = (p(o) & 0xff) | (p(o + 1) & 0xff) << 8
    def le32(o: Int): Int =
      (p(o) & 0xff) | (p(o + 1) & 0xff) << 8 |
        (p(o + 2) & 0xff) << 16 | (p(o + 3) & 0xff) << 24
    val isWav = p.length >= 44 &&
      p.startsWith("RIFF".getBytes("US-ASCII")) &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(p, 8, 12), "WAVE".getBytes("US-ASCII"))
    if (!isWav) AudioFeatures(doc_id, p.length, 0, 0, 0, 0L, 0L)
    else {
      val ch = le16(22); val rate = le32(24); val bits = le16(34)
      val dataSize = le32(40)
      val n = if (ch > 0 && bits >= 8) dataSize.toLong / (ch * (bits / 8)) else 0L
      val ms = if (rate > 0) n * 1000L / rate else 0L
      AudioFeatures(doc_id, p.length, ch, rate, bits, n, ms)
    }
  }

  /** Partition-batched audio feature extraction (same batching contract as
    * extractFeatures). */
  def extractAudio(records: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => decodeWav(r.doc_id, r.payload)))
  }

  /** Decoded JPEG frame-header features. */
  final case class JpegFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      precision: Int,
      n_components: Int)

  /** Synthesize a minimal valid JPEG: SOI, APP0/JFIF, a COM segment
    * carrying `comment` (variable length — forces the decoder to walk, not
    * peek at fixed offsets), an SOF0 frame header with the dimensions, and
    * EOI. Markers and segment layouts per the public JPEG (ITU T.81 §B) and
    * JFIF specs. */
  def jpegHeader(width: Int, height: Int, comment: String): Array[Byte] = {
    val cb = comment.getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer.allocate(45 + cb.length) // big-endian default
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.put(1.toByte).put(1.toByte) // version 1.1
    buf.put(0.toByte).putShort(1).putShort(1) // units, densities
    buf.put(0.toByte).put(0.toByte) // no thumbnail
    buf.put(0xff.toByte).put(0xfe.toByte) // COM
    buf.putShort((2 + cb.length).toShort).put(cb)
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len 8+3·3
    buf.put(8.toByte) // precision
    buf.putShort(height.toShort).putShort(width.toShort)
    buf.put(3.toByte) // components
    for (c <- 1 to 3) { buf.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    buf.put(0xff.toByte).put(0xd9.toByte) // EOI
    buf.array()
  }

  /** Parse the JPEG frame header FOR REAL: walk the marker stream from SOI,
    * skipping each segment by its big-endian length (standalone markers
    * RSTn/TEM have none), until a start-of-frame marker (SOFn, excluding
    * DHT/JPG/DAC which share the 0xCx range) yields precision, height,
    * width and component count. Junk payloads get the zero record. */
  def decodeJpeg(doc_id: Long, p: Array[Byte]): JpegFeatures = {
    def be16(o: Int): Int = (p(o) & 0xff) << 8 | (p(o + 1) & 0xff)
    val zero = JpegFeatures(doc_id, p.length, 0, 0, 0, 0)
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) zero
    else {
      var pos = 2
      while (pos + 3 < p.length && (p(pos) & 0xff) == 0xff) {
        val m = p(pos + 1) & 0xff
        if (m == 0xd9) return zero // EOI before any SOF
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2 // standalone
        else {
          val len = be16(pos + 2)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (pos + 9 >= p.length) return zero
            return JpegFeatures(doc_id, p.length, be16(pos + 7), be16(pos + 5),
              p(pos + 4) & 0xff, p(pos + 9) & 0xff)
          }
          pos += 2 + len
        }
      }
      zero
    }
  }

  /** Partition-batched JPEG feature extraction. */
  def extractJpeg(records: Dataset[MediaRecord]): Dataset[JpegFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => decodeJpeg(r.doc_id, r.payload)))
  }

  /** Decoded MP4 container metadata. */
  final case class Mp4Features(
      doc_id: Long,
      n_bytes: Int,
      n_boxes: Int,
      timescale: Long,
      duration: Long,
      duration_ms: Long)

  /** Synthesize a minimal valid MP4: an ftyp box, a variable-size free box
    * (padding forces real box walking), and a moov box containing a
    * version-0 mvhd with the given timescale/duration. Box grammar per the
    * public ISO base-media spec (ISO/IEC 14496-12 §4.2, §8.2.2). */
  def mp4Header(timescale: Int, duration: Int, pad: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(140 + pad) // big-endian default
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
    buf.put("isom".getBytes("US-ASCII")).putInt(0)
    buf.putInt(8 + pad).put("free".getBytes("US-ASCII"))
    buf.position(buf.position() + pad)
    buf.putInt(116).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
    buf.putInt(0) // version 0 + flags
    buf.putInt(0).putInt(0) // creation/modification time
    buf.putInt(timescale).putInt(duration)
    buf.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
    buf.putInt(0).putInt(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(buf.putInt)
    (1 to 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2) // next_track_ID
    buf.array()
  }

  /** Parse MP4 container metadata FOR REAL: walk the top-level box sequence
    * by (u32 size, 4CC type), descend into moov, and read the version-0
    * mvhd timescale/duration (duration_ms in integer math). Junk payloads
    * get the zero record. */
  def decodeMp4(doc_id: Long, p: Array[Byte]): Mp4Features = {
    def be32(o: Int): Long =
      ((p(o) & 0xff).toLong << 24 | (p(o + 1) & 0xff) << 16 |
        (p(o + 2) & 0xff) << 8 | (p(o + 3) & 0xff))
    def fourcc(o: Int): String = new String(p, o + 4, 4, "US-ASCII")
    var pos = 0
    var nBoxes = 0
    var ts = 0L; var dur = 0L
    while (pos + 8 <= p.length) {
      val size = be32(pos)
      if (size < 8 || pos + size > p.length) // malformed → stop walking
        return Mp4Features(doc_id, p.length, 0, 0L, 0L, 0L)
      nBoxes += 1
      if (fourcc(pos) == "moov") {
        var cp = pos + 8
        while (cp + 8 <= pos + size) {
          val csize = be32(cp)
          if (csize < 8 || cp + csize > pos + size)
            return Mp4Features(doc_id, p.length, 0, 0L, 0L, 0L)
          if (fourcc(cp) == "mvhd" && csize >= 28 && (p(cp + 8) & 0xff) == 0) {
            ts = be32(cp + 20); dur = be32(cp + 24)
          }
          cp += csize.toInt
        }
      }
      pos += size.toInt
    }
    val ms = if (ts > 0) dur * 1000L / ts else 0L
    Mp4Features(doc_id, p.length, nBoxes, ts, dur, ms)
  }

  /** Partition-batched MP4 metadata extraction. */
  def extractMp4(records: Dataset[MediaRecord]): Dataset[Mp4Features] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => decodeMp4(r.doc_id, r.payload)))
  }

  /** One tar archive member as the manifest walk reports it. */
  final case class TarMember(
      doc_id: Long,
      member_idx: Int,
      name: String,
      size: Long,
      data_offset: Long,
      cksum_ok: Boolean)

  /** Synthesize a POSIX ustar archive: `(doc_id % 3) + 1` members named
    * `f<k>.bin` of size `(doc_id·7 + k·13) % 900 + 1`, each a 512-byte
    * header (octal size at offset 124, REAL checksum at 148 — sum of
    * header bytes with the checksum field as spaces, per the ustar spec)
    * plus zero-filled data rounded to whole blocks, terminated by two
    * zero blocks. */
  def tarArchive(docId: Long): Array[Byte] = {
    val n = (docId % 3).toInt + 1
    val sizes = (0 until n).map(k => ((docId * 7 + k * 13) % 900 + 1).toInt)
    val total = sizes.map(sz => 512 + 512 * ((sz + 511) / 512)).sum + 1024
    val buf = new Array[Byte](total) // zero-initialized
    var pos = 0
    def putAscii(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, buf, off, b.length)
    }
    for (k <- 0 until n) {
      val h = pos
      putAscii(h, s"f$k.bin")
      putAscii(h + 100, "0000644") // mode (NUL-terminated via zero fill)
      putAscii(h + 108, "0000000") // uid
      putAscii(h + 116, "0000000") // gid
      putAscii(h + 124, f"${sizes(k).toLong}%011o") // size, 11 octal digits
      putAscii(h + 136, "00000000000") // mtime
      java.util.Arrays.fill(buf, h + 148, h + 156, ' '.toByte) // chksum blanks
      buf(h + 156) = '0' // typeflag: regular file
      putAscii(h + 257, "ustar") // magic (+ NUL from zero fill)
      putAscii(h + 263, "00") // version
      var sum = 0L
      for (i <- h until h + 512) sum += buf(i) & 0xff
      putAscii(h + 148, f"$sum%06o")
      buf(h + 154) = 0
      buf(h + 155) = ' '
      pos += 512 + 512 * ((sizes(k) + 511) / 512)
    }
    buf
  }

  /** Walk a tar archive's 512-byte block chain FOR REAL: parse each
    * header's octal size field, verify the header checksum (field blanked
    * to spaces), record the member's data offset, and skip
    * ceil(size/512) data blocks; an all-zero header block terminates the
    * walk (the two-zero-block EOF). */
  def decodeTar(docId: Long, p: Array[Byte]): Seq[TarMember] = {
    val out = Seq.newBuilder[TarMember]
    var pos = 0
    var idx = 0
    def octal(off: Int, len: Int): Long = {
      var v = 0L
      var i = off
      while (i < off + len && p(i) != 0 && p(i) != ' ') {
        v = v * 8 + (p(i) - '0'); i += 1
      }
      v
    }
    while (pos + 512 <= p.length && p(pos) != 0) {
      val nameEnd = {
        var e = pos
        while (e < pos + 100 && p(e) != 0) e += 1
        e
      }
      val name = new String(p, pos, nameEnd - pos, "US-ASCII")
      val size = octal(pos + 124, 12)
      val declared = octal(pos + 148, 8)
      var sum = 0L
      for (i <- pos until pos + 512) {
        sum += (if (i >= pos + 148 && i < pos + 156) ' '.toLong else (p(i) & 0xff).toLong)
      }
      out += TarMember(docId, idx, name, size, pos + 512L, sum == declared)
      pos += 512 + 512 * (((size + 511) / 512)).toInt
      idx += 1
    }
    out.result()
  }

  /** Partition-batched tar manifest walk (1 archive → N member rows). */
  def extractTar(records: Dataset[MediaRecord]): Dataset[TarMember] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap(r => decodeTar(r.doc_id, r.payload)))
  }

  /** Synthesis parameters for one GIF payload. */
  final case class GifSpec(
      doc_id: Long, v89: Boolean, width: Int, height: Int,
      hasGct: Boolean, gctExp: Int)

  /** Decoded GIF logical-screen features. */
  final case class GifFeatures(
      doc_id: Long,
      n_bytes: Int,
      version: String,
      width: Int,
      height: Int,
      n_colors: Int)

  /** Synthesize a GIF87a/89a payload: 6-byte signature, LITTLE-endian
    * u16 dimensions, the packed logical-screen byte (GCT flag bit 7,
    * color-resolution bits 6-4, size exponent bits 2-0), the global
    * color table when flagged (3·2^(exp+1) deterministic bytes), and the
    * 0x3B trailer. */
  def gifImage(sp: GifSpec): Array[Byte] = {
    val colors = if (sp.hasGct) 3 * (1 << (sp.gctExp + 1)) else 0
    val buf = java.nio.ByteBuffer.allocate(13 + colors + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put((if (sp.v89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    buf.putShort(sp.width.toShort).putShort(sp.height.toShort)
    buf.put((((if (sp.hasGct) 1 else 0) << 7) | (7 << 4) | sp.gctExp).toByte)
    buf.put(0.toByte).put(0.toByte) // background index, aspect ratio
    for (i <- 0 until colors) buf.put(((sp.doc_id + i) % 256).toByte)
    buf.put(0x3b.toByte) // trailer
    buf.array()
  }

  /** Parse the GIF header FOR REAL: check the signature, read the
    * little-endian dimensions, unpack the GCT flag and size exponent,
    * and skip the color table to confirm the trailer is where the
    * packed byte said it would be (junk payloads get the zero record). */
  def decodeGif(docId: Long, p: Array[Byte]): GifFeatures = {
    val zero = GifFeatures(docId, p.length, "", 0, 0, 0)
    if (p.length < 14) return zero
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return zero
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val packed = p(10) & 0xff
    val nColors = if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1) else 0
    val trailerAt = 13 + 3 * nColors
    if (p.length <= trailerAt || (p(trailerAt) & 0xff) != 0x3b) return zero
    GifFeatures(docId, p.length, sig.substring(3), le16(6), le16(8), nColors)
  }

  /** Partition-batched GIF metadata extraction. */
  def extractGif(records: Dataset[MediaRecord]): Dataset[GifFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => decodeGif(r.doc_id, r.payload)))
  }
}
