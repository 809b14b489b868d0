package graft.streaming

/** The file stream source reads a DIRECTORY of files; the driver corpus is a
  * single parquet file per table. Stage it behind a temp dir via symlink
  * (copy only if the filesystem refuses links) — harness glue for the gate;
  * a production stream reads a landing directory or a Kafka topic directly.
  */
private[streaming] object Staging {

  /** @return a directory containing (a link to) `$d/$table.parquet` */
  def stageTable(d: String, table: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$table")
    val target = dir.resolve(s"$table.parquet")
    val src = java.nio.file.Paths.get(s"$d/$table.parquet")
    try java.nio.file.Files.createSymbolicLink(target, src)
    catch { case _: Exception => java.nio.file.Files.copy(src, target) }
    // the link and dir are per-query-run scratch: reclaim them on JVM exit
    // rather than accumulating one dir per streaming query per run
    target.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    dir.toString
  }
}
