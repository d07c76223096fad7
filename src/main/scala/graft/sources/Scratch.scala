package graft.sources

import java.nio.file.{Files, Path}

/** Scratch space for file-backed gate queries (EDF round-trips, the
  * parquet sink). Each query name maps to ONE stable directory that is
  * emptied on re-acquisition — so bench loops (cold + 3 warm runs, two
  * scale points) overwrite instead of accumulating full table copies in
  * /tmp — and the whole tree is removed at JVM exit.
  */
object Scratch {

  private lazy val base: Path = {
    val p = Files.createTempDirectory("graft_scratch")
    sys.addShutdownHook(deleteRec(p))
    p
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRec(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  /** A per-name scratch dir, emptied of any previous invocation's
    * output (stale files from a run at a different scale factor must
    * not leak into a glob read-back).
    */
  def dir(name: String): String = {
    val p = base.resolve(name)
    if (Files.exists(p)) deleteRec(p)
    Files.createDirectories(p)
    p.toString
  }
}
