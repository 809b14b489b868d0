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
}
