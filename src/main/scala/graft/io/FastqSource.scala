package graft.io

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** FASTQ as a first-class DataSource V2 connector —
  * `spark.read.format("graft.fastq").load(path)` — the deepest form of the
  * SURVEY S1 "source" tier: the format plugs into Catalyst's connector API
  * instead of hand-rolling an RDD, so it composes with everything the
  * planner does for real sources. Column pruning is PUSHED INTO THE READER
  * (`SupportsPushDownRequiredColumns`): `select("sequence")` makes the
  * per-record parse skip materializing name/quality — visible in the scan's
  * ReadSchema, exactly like a parquet scan.
  *
  * Record layout (public FASTQ format): 4 lines per record — `@name` /
  * sequence / `+[name]` / qualities. The quality line may itself start
  * with '@', so byte-offset splits cannot be record-aligned without an
  * index; each FILE is therefore one `InputPartition` (files are the unit
  * of parallelism — the common case at scale is many files). `.gz` files
  * decode through a stream gunzip. The driver's Hadoop conf ships to
  * executors via the same serializable carrier the BAM reader uses, so
  * `spark.hadoop.*` (object-store credentials/endpoints) apply on the
  * executor open path.
  */
class FastqSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft.fastq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FastqSource.fullSchema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FastqTable(FastqSource.paths(properties))
}

object FastqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("sequence", StringType, nullable = true),
    StructField("quality", StringType, nullable = true)))

  /** `load(p)` arrives as "path"; `load(ps: _*)` as a JSON array under
    * "paths" (flat strings — a minimal parse avoids a JSON dependency). */
  def paths(properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      js.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    single ++ multi
  }
}

private[io] class FastqTable(roots: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft.fastq(${roots.mkString(",")})"
  override def schema(): StructType = FastqSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FastqScanBuilder(roots)
}

private[io] class FastqScanBuilder(roots: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FastqSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FastqScan(roots, required)
}

private[io] class FastqScan(roots: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per file: enumerate on the driver with the session conf
    * (directories recurse one level; bare files pass through). */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    roots.flatMap { root =>
      val p = new Path(root)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
      else Seq(root)
    }.sorted.map(f => FastqPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new HadoopConf(
      new Configuration(SparkSession.active.sparkContext.hadoopConfiguration))
    new FastqReaderFactory(required, conf)
  }
}

private[io] case class FastqPartition(path: String) extends InputPartition

private[io] class FastqReaderFactory(required: StructType, conf: HadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FastqReader(partition.asInstanceOf[FastqPartition].path, required, conf.value)
}

/** Streams one file's records; only the pruned columns are materialized. */
private[io] class FastqReader(path: String, required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val needName = required.fieldNames.contains("name")
  private val needSeq = required.fieldNames.contains("sequence")
  private val needQual = required.fieldNames.contains("quality")
  private val ordinals = required.fieldNames.zipWithIndex.toMap

  private val reader: BufferedReader = {
    val p = new Path(path)
    val raw = p.getFileSystem(conf).open(p)
    val in = if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    val l1 = reader.readLine()
    if (l1 == null) return false
    val l2 = reader.readLine(); val l3 = reader.readLine()
    val l4 = reader.readLine()
    if (l2 == null || l3 == null || l4 == null)
      throw new java.io.IOException(
        s"$path: truncated FASTQ record starting at '$l1'")
    val values = new Array[Any](required.length)
    if (needName)
      values(ordinals("name")) = UTF8String.fromString(l1.stripPrefix("@"))
    if (needSeq) values(ordinals("sequence")) = UTF8String.fromString(l2)
    if (needQual) values(ordinals("quality")) = UTF8String.fromString(l4)
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
