package graft

import java.nio.file.Files
import graft.io.{Fasta, Gtf}

/** Sources/CLI round trip: GTF parsing (S4), FASTA genome (S5), and the
  * index → quantify CLI path (S6/S7) on a tiny synthetic annotation. */
class IoSuite extends SparkSuite {
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val f = Files.createTempFile("graft_" + name, ".txt")
    Files.writeString(f, content)
    f.toString
  }

  val gtfContent =
    """# comment line
      |chr1	test	exon	1	10	.	+	.	gene_id "g1"; transcript_id "t1";
      |chr1	test	exon	12	20	.	+	.	gene_id "g1"; transcript_id "t1";
      |chr1	test	exon	5	15	.	-	.	gene_id "g2"; transcript_id "t2";
      |chr1	test	CDS	5	15	.	-	.	gene_id "g2"; transcript_id "t2";
      |""".stripMargin

  test("GTF exon parsing: 1-based inclusive → 0-based half-open, exons only") {
    val path = write("ann", gtfContent)
    val exons = Gtf.exons(spark, path).collect()
    assert(exons.length === 3) // the CDS row is dropped
    val t1 = exons.filter(_.getString(0) == "t1").sortBy(_.getLong(3))
    assert(t1.map(r => (r.getLong(3), r.getLong(4))).toSeq === Seq((0L, 10L), (11L, 20L)))
    assert(t1.forall(_.getBoolean(5)))
    val t2 = exons.filter(_.getString(0) == "t2")
    assert(t2.head.getLong(3) === 4L && t2.head.getLong(4) === 15L)
    assert(!t2.head.getBoolean(5))
  }

  test("GTF transcripts assemble nested exon arrays") {
    val path = write("ann2", gtfContent)
    val t = Gtf.transcripts(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](4)).toMap
    assert(t.keySet === Set("t1", "t2"))
    assert(t("t1").length === 2)
    assert(t("t2").length === 1)
  }

  test("FASTA reader concatenates wrapped lines per record") {
    val path = write("ref", ">chr1 description\nCAATC\nCTTCG\n>chr2\nGCAGTGCA\n")
    val genome = Fasta.read(path)
    assert(genome === Map("chr1" -> "CAATCCTTCG", "chr2" -> "GCAGTGCA"))
  }

  test("FASTQ reader extracts sequence lines, loader dispatches by extension") {
    val fq = Files.createTempFile("graft_reads", ".fastq")
    Files.writeString(fq,
      "@r1\nCAATCCTTCG\n+\nIIIIIIIIII\n@r2\nGCAGTGCA\n+\nIIIIIIII\n")
    val seqs = graft.io.Fastq.loadReads(spark, fq.toString)
      .collect().map(_.getString(0)).sorted
    assert(seqs.toSeq === Seq("CAATCCTTCG", "GCAGTGCA"))
  }

  test("SAM reader extracts SEQ column, loader dispatches .sam") {
    val sam = Files.createTempFile("graft_reads", ".sam")
    Files.writeString(sam,
      "@HD\tVN:1.6\tSO:unsorted\n" +
        "@SQ\tSN:chr1\tLN:20\n" +
        "r1\t0\tchr1\t1\t60\t10M\t*\t0\t0\tCAATCCTTCG\tIIIIIIIIII\n" +
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tGCAGTGCA\tIIIIIIII\n" +
        "r3\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n") // SEQ '*' → dropped
    val seqs = graft.io.Fastq.loadReads(spark, sam.toString)
      .collect().map(_.getString(0)).sorted
    assert(seqs.toSeq === Seq("CAATCCTTCG", "GCAGTGCA"))
  }

  test("BAM reader decodes 4-bit packed sequences, loader dispatches .bam") {
    // hand-built BAM (spec v1.6 §4.2): BGZF is concatenated gzip members,
    // so a plain GZIPOutputStream stream is a valid input to the decoder
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bases = "=ACMGRSVTWYHKDNB"
    def record(name: String, seq: String): Array[Byte] = {
      val packed = seq.grouped(2).map { pair =>
        val hi = bases.indexOf(pair(0))
        val lo = if (pair.length > 1) bases.indexOf(pair(1)) else 0
        ((hi << 4) | lo).toByte
      }.toArray
      val nameZ = (name + "\u0000").getBytes("ISO-8859-1")
      val qual = Array.fill[Byte](seq.length)(0xff.toByte)
      val body = le32(-1) ++ le32(-1) ++ // refID, pos
        Array(nameZ.length.toByte, 0.toByte) ++ // l_read_name, mapq
        Array(0.toByte, 0.toByte) ++ // bin
        Array(0.toByte, 0.toByte) ++ // n_cigar_op
        le32(4).take(2) ++ // flag = 4 (unmapped), 2 bytes
        le32(seq.length) ++ le32(-1) ++ le32(-1) ++ le32(0) ++ // l_seq, next*, tlen
        nameZ ++ packed ++ qual
      le32(body.length) ++ body
    }
    val payload = "BAM\u0001".getBytes("ISO-8859-1") ++
      le32(0) ++ // empty header text
      le32(1) ++ le32(5) ++ "chr1\u0000".getBytes("ISO-8859-1") ++ le32(20) ++
      record("r1", "CAATCCTTCG") ++ record("r2", "GCAGTGCA")
    val bam = Files.createTempFile("graft_reads", ".bam")
    val gz = new java.util.zip.GZIPOutputStream(Files.newOutputStream(bam))
    gz.write(payload); gz.close()
    val seqs = graft.io.Fastq.loadReads(spark, bam.toString)
      .collect().map(_.getString(0)).sorted
    assert(seqs.toSeq === Seq("CAATCCTTCG", "GCAGTGCA"))
  }

  test("cli index + quantify end to end on the stub fixture") {
    // the QuantifySuite stub genome laid out as chr1 (QuantifySuite.scala:31-37)
    val fa = write("genome", ">chr1\nCAATCCTTCGCCGCAGTGCA\n")
    val gtf = write("ann3",
      """chr1	t	exon	1	10	.	+	.	gene_id "g1"; transcript_id "transcript1";
        |chr1	t	exon	12	20	.	+	.	gene_id "g1"; transcript_id "transcript2";
        |""".stripMargin)
    val out = Files.createTempDirectory("graft_cli").toString
    graft.cli.Main.main(Array("index", fa, gtf, "5", s"$out/idx"))
    val kmers = spark.read.parquet(s"$out/idx_kmers")
    assert(kmers.count() > 0)
    assert(kmers.filter($"kmer" === "CAATC").count() === 1)

    // reads drawn verbatim from the two transcripts
    Seq("CAATCCTTCG", "CGCAGTGCA", "CAATCCTTCG")
      .toDF("sequence").write.mode("overwrite").parquet(s"$out/reads")
    graft.cli.Main.main(Array("quantify", s"$out/reads", s"$out/idx", gtf, "5",
      s"$out/abundances", "-max_iterations", "5",
      "-disable_kmer_calibration", "-disable_length_calibration"))
    val lines = spark.read.text(s"$out/abundances").collect().map(_.getString(0))
    assert(lines.length === 2)
    assert(lines.forall(_.contains(", ")))
  }
}
