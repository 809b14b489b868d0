package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, IOException, InputStream}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BAM read source (public SAM/BAM spec v1.6 — samtools.github.io/hts-specs).
  *
  * BAM is BGZF — a series of concatenated gzip members — wrapping a binary
  * record stream. `GZIPInputStream` natively handles member concatenation
  * and the BGZF FEXTRA header field, so no external codec is required; the
  * record layout (magic, header text, reference dictionary, then
  * length-prefixed alignment blocks with 4-bit-packed sequences) is decoded
  * directly. Only `sequence` is extracted — the one field the reference
  * pipeline consumes (Quantify.scala:42,59).
  *
  * Scale design: `binaryFiles` + `PortableDataStream` gives one task per
  * file that decodes STREAMING — compressed bytes flow straight from the
  * filesystem through the gzip inflater to the record iterator, so a task
  * holds O(1) memory (one gzip buffer + one record) regardless of file
  * size: a 200 GB BAM neither materializes as a byte array nor hits
  * Spark's 2 GiB binary-column cap. (Intra-file chunk splitting via
  * .bai/virtual offsets — what ADAM/Hadoop-BAM add — is deliberately out
  * of scope, as the reference delegated it to ADAM too.)
  */
object Bam {

  /** BAM 4-bit base codes, spec §4.2.3. */
  private val Bases = "=ACMGRSVTWYHKDNB"

  /** In-memory convenience overload (tests, small files). */
  def decode(bytes: Array[Byte]): Iterator[String] =
    decode(new ByteArrayInputStream(bytes))

  /** Lazily decode the read sequences of one BAM byte STREAM — the stream
    * is consumed record by record, never materialized. Zero-length
    * sequences (SEQ = '*') are skipped. */
  def decode(raw: InputStream): Iterator[String] = {
    val in = new DataInputStream(new GZIPInputStream(new BufferedInputStream(raw, 1 << 16)))
    def i32(): Int = {
      val b = new Array[Byte](4); in.readFully(b)
      (b(0) & 0xff) | (b(1) & 0xff) << 8 | (b(2) & 0xff) << 16 | (b(3) & 0xff) << 24
    }
    val magic = new Array[Byte](4); in.readFully(magic)
    if (!magic.sameElements("BAM\u0001".getBytes("ISO-8859-1")))
      throw new IOException("not a BAM file (bad magic)")
    in.skipNBytes(i32().toLong) // plain-text header
    (0 until i32()).foreach { _ => // reference dictionary: name + l_ref each
      in.skipNBytes(i32().toLong); i32()
    }

    val it = new Iterator[String] {
      private var nextSeq: String = advance()
      private def advance(): String =
        try {
          val blockSize = i32()
          // fixed 32-byte record prefix (spec §4.2): refID pos l_read_name
          // mapq bin n_cigar_op flag l_seq next_refID next_pos tlen
          val b = new Array[Byte](32); in.readFully(b)
          val lReadName = b(8) & 0xff
          val nCigar = (b(12) & 0xff) | (b(13) & 0xff) << 8
          val lSeq = (b(16) & 0xff) | (b(17) & 0xff) << 8 |
            (b(18) & 0xff) << 16 | (b(19) & 0xff) << 24
          in.skipNBytes(lReadName + 4L * nCigar)
          val packed = new Array[Byte]((lSeq + 1) / 2); in.readFully(packed)
          val sb = new java.lang.StringBuilder(lSeq)
          var i = 0
          while (i < lSeq) {
            val nib =
              if (i % 2 == 0) (packed(i / 2) >> 4) & 0xf else packed(i / 2) & 0xf
            sb.append(Bases.charAt(nib)); i += 1
          }
          // qual + aux fields fill the rest of the block
          in.skipNBytes(blockSize - 32L - lReadName - 4L * nCigar - (lSeq + 1) / 2)
          sb.toString
        } catch { case _: EOFException => null }
      def hasNext: Boolean = nextSeq != null
      def next(): String = { val s = nextSeq; nextSeq = advance(); s }
    }
    it.filter(_.nonEmpty)
  }

  /** DataFrame(sequence string) — one row per read with a stored sequence.
    * `binaryFiles` hands each task a PortableDataStream (an opened,
    * seek-free handle), NOT the file contents: decode streams from it. The
    * RDD hop is deliberate — this is genuine per-partition imperative I/O,
    * the one place SURVEY licenses RDDs. */
  def reads(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => decode(pds.open()) }
      .toDF("sequence")
  }
}
