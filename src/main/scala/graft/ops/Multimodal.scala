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
  * The decode itself is a clearly-marked STUB (no image/audio codecs in
  * this environment): it derives deterministic pseudo-dimensions from the
  * first payload bytes. The Spark-side plumbing — schema, binary transport,
  * partition-batched extraction, checksum — is real and oracle-checked.
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
    * (JPEG/PNG/WAV...). Deterministic fake: dimensions from the first two
    * payload bytes, 3 channels. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (payload(0) & 0xff, payload(1) & 0xff, 3)

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
        val (w, h, c) = decodeStub(r.payload)
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
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
