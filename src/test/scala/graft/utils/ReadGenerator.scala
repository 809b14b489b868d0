package graft.utils

import scala.math.abs
import scala.util.Random
import graft.model.Read

/** Port of the reference's ideal read sampler (rice-core/src/test/scala/org/
  * bdgenomics/rice/utils/ReadGenerator.scala): error-free reads with
  * length-weighted allocation — reads per transcript ∝ abundance × length
  * (ReadGenerator.scala:71-73) and uniform start positions (:37-48).
  */
object ReadGenerator {

  private[utils] def generateReads(transcript: String, reads: Int, rv: Random,
      readLength: Int): Seq[Read] = {
    val transcriptLength = transcript.length
    (0 until reads).map { _ =>
      val readStart = rv.nextInt(transcriptLength - readLength)
      Read(transcript.substring(readStart, readStart + readLength))
    }
  }

  def apply(transcripts: Seq[String],
      relativeAbundances: Seq[Double],
      numReads: Int,
      readLength: Int,
      seed: Option[Long]): Seq[Read] = {
    val lengths = transcripts.map(_.length)
    assert(lengths.min >= readLength, "Transcripts must be longer than read length.")
    assert(relativeAbundances.length == transcripts.length)
    assert(abs(relativeAbundances.sum - 1.0) < 0.001)

    val preWeights = relativeAbundances.indices.map(i => lengths(i) * relativeAbundances(i))
    val totalWeight = preWeights.sum
    val fraction = preWeights.map(_ / totalWeight)

    val rv = seed.fold(new Random)(new Random(_))
    relativeAbundances.indices.flatMap { i =>
      val reads = (fraction(i) * numReads.toDouble).toInt
      generateReads(transcripts(i), reads, rv, readLength)
    }
  }
}
