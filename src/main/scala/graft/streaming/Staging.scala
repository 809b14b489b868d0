package graft.streaming

/** The file stream source reads a DIRECTORY of files; the driver corpus is a
  * single parquet file per table. Stage it behind a temp dir via symlink
  * (copy only if the filesystem refuses links) — harness glue for the gate;
  * a production stream reads a landing directory or a Kafka topic directly.
  */
private[streaming] object Staging {

  /** @return a directory containing (links to) `$d/$table.parquet`'s data.
    * Handles both corpus layouts: a single parquet FILE (the driver
    * testdata) and a DIRECTORY of part files (anything Spark wrote, e.g.
    * the graft.Scale sf1 corpus — the file stream source does not recurse
    * into a linked subdirectory, so each part file is linked flat). */
  def stageTable(d: String, table: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$table")
    val src = java.nio.file.Paths.get(s"$d/$table.parquet")
    def link(target: java.nio.file.Path, source: java.nio.file.Path): Unit = {
      try java.nio.file.Files.createSymbolicLink(target, source)
      catch { case _: Exception => java.nio.file.Files.copy(source, target) }
      target.toFile.deleteOnExit()
    }
    if (java.nio.file.Files.isDirectory(src)) {
      val s = java.nio.file.Files.list(src)
      try s.forEach { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          link(dir.resolve(f.getFileName.toString), f)
      } finally s.close()
    } else link(dir.resolve(s"$table.parquet"), src)
    // the links and dir are per-query-run scratch: reclaim them on JVM exit
    // rather than accumulating one dir per streaming query per run
    dir.toFile.deleteOnExit()
    dir.toString
  }
}
