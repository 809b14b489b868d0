package graft.utils

import scala.util.Random

/** Port of the reference's synthetic transcript generator — semantics
  * preserved verbatim (rice-core/src/test/scala/org/bdgenomics/rice/utils/
  * TranscriptGenerator.scala), including its quirks:
  *  - generateString draws nextInt(3) so 'T' is never emitted
  *    (TranscriptGenerator.scala:42-55 as written);
  *  - the regeneration loop's condition combines independence and
  *    non-repetitiveness exactly as the reference does (:133-156).
  * The generator doubles as the ground-truth builder: it returns the
  * kmer→class and class→transcript maps the tests verify against.
  */
object TranscriptGenerator {

  private[utils] def transcriptIsNonRepetitive(k: Int, s: String): Boolean = {
    val kmers = s.sliding(k).toSeq
    kmers.size == kmers.toSet.size
  }

  def generateString(length: Int, rv: Random): String = {
    assert(length > 0)
    val sb = new StringBuilder(length)
    (0 until length).foreach { _ =>
      sb.append(rv.nextInt(3) match {
        case 0 => 'A'
        case 1 => 'C'
        case 2 => 'G'
        case _ => 'T'
      })
    }
    sb.toString()
  }

  private[utils] def transcriptsAreIndependent(k: Int, t: Seq[String]): Boolean = {
    val tMers = t.map(_.sliding(k).toSet)
    val totalSet = tMers.reduce(_ ++ _)
    val sumSize = tMers.map(_.size).sum
    totalSet.size == sumSize
  }

  /** Shared-equivalence-class transcripts built by concatenating shuffled
    * class components (TranscriptGenerator.scala:88-122). */
  def generateTranscripts(kmerLength: Int,
      classSize: Seq[Int],
      classMultiplicity: Seq[Int],
      classMembership: Seq[Set[Int]],
      randomSeed: Option[Long] = None): (Seq[String], Seq[String], Map[String, Long], Map[Long, Iterable[String]]) = {
    assert(classMembership.length == classMembership.toSet.size,
      "Class membership composition must not be repeated.")

    val rv = randomSeed.fold(new Random())(new Random(_))
    val (sequences, _, kmerMap, _) = generateIndependentTranscripts(kmerLength, classSize, randomSeed)

    val transcripts = classMembership.map { s =>
      val components = rv.shuffle(s.toSeq.flatMap(i => (0 until classMultiplicity(i)).map(_ => i)))
      components.map(i => sequences(i)).reduce(_ + _)
    }

    val names = classMembership.indices.map(_.toString)
    val tMap = classMembership.zipWithIndex
      .flatMap(vk => vk._1.map(i => (i, vk._2)))
      .groupBy(_._1)
      .map(kv => (kv._1.toLong, kv._2.map(p => p._2.toString): Iterable[String]))

    (transcripts, names, kmerMap, tMap)
  }

  /** Independent, non-repetitive transcripts with their ground-truth maps
    * (TranscriptGenerator.scala:133-156). */
  def generateIndependentTranscripts(kmerLength: Int,
      transcriptLengths: Seq[Int],
      randomSeed: Option[Long] = None): (Seq[String], Seq[String], Map[String, Long], Map[Long, Iterable[String]]) = {
    assert(kmerLength > 0)
    assert(transcriptLengths.forall(_ > 0))

    val rv = randomSeed.fold(new Random)(new Random(_))
    var transcripts = Seq[String]()
    while ({
      transcripts = transcriptLengths.map(generateString(_, rv))
      !transcriptsAreIndependent(kmerLength, transcripts) &&
        transcripts.forall(transcriptIsNonRepetitive(kmerLength, _))
    }) ()

    val tNames = transcripts.indices.map(_.toString)
    val classMap = transcripts.indices
      .map(tId => (tId.toLong, Iterable(tId.toString))).toMap
    val tMerMap = transcripts.indices.flatMap { tId =>
      transcripts(tId).sliding(kmerLength).map(k => (k, tId.toLong))
    }.toMap

    (transcripts, tNames, tMerMap, classMap)
  }
}
