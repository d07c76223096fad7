package graft.sources

import java.nio.file.{Files, Path, Paths => JPaths}

/** File-fleet path utilities — the graft twin of the reference's
  * `file_io/path_utils.py` (re_match :17, mismatched :79, rename :102,
  * metadata :142): pairing a directory of recordings with their
  * annotation files by a shared stem key, flagging orphans, bulk
  * renaming, and extracting path-encoded metadata.
  *
  * These are DRIVER-side utilities by design: in Spark, file listing
  * and path pairing happen on the driver (or in the catalog) before a
  * distributed read — the distributed half of fleet ingest is the glob
  * path `Edf.readSpark` / JSONL already handle. [[pairedTable]] bridges
  * the two: it pairs two globs driver-side and hands back a DataFrame
  * keyed for the downstream joins.
  */
object PathUtils {

  private def stem(p: String): String = {
    val name = JPaths.get(p).getFileName.toString
    val dot = name.lastIndexOf('.')
    if (dot > 0) name.substring(0, dot) else name
  }

  /** Pair two equal-length path lists by the first `pattern` match in
    * each stem (reference re_match semantics): every stem must contain
    * the pattern, and each path's matched key must select exactly one
    * partner.
    */
  def reMatch(paths: Seq[String], others: Seq[String], pattern: String): Seq[(String, String)] = {
    require(
      paths.length == others.length,
      s"number of paths must match: ${paths.length} != ${others.length}"
    )
    val re = pattern.r
    val missing = (paths ++ others).map(stem).filter(s => re.findFirstIn(s).isEmpty)
    require(missing.isEmpty, s"pattern $pattern is missing in path stems: $missing")
    paths.map { p =>
      val key = re.findFirstIn(stem(p)).get
      val hits = others.filter(o => stem(o).contains(key))
      require(
        hits.length == 1,
        s"matches for $p using $pattern are ${hits.map(stem)}; must be exactly 1"
      )
      (p, hits.head)
    }
  }

  /** Stems present in exactly one of the two fleets (symmetric
    * difference) — the orphan check run before a paired ingest.
    */
  def mismatched(paths: Seq[String], others: Seq[String]): Set[String] =
    paths.map(stem).toSet.union(others.map(stem).toSet) --
      paths.map(stem).toSet.intersect(others.map(stem).toSet)

  /** In-place bulk rename: replace `substring` across the FULL path
    * string with `replacement` (no copy) — reference path_utils.rename
    * (:102) semantics: a match in a parent directory moves the file
    * there (the target directory must exist).
    */
  def rename(paths: Seq[String], substring: String, replacement: String): Unit =
    paths.foreach { p =>
      if (p.contains(substring)) {
        Files.move(JPaths.get(p), JPaths.get(p.replace(substring, replacement)))
      }
    }

  /** Path-encoded metadata: each named pattern must carry exactly one
    * regex group; the group's first match in the path becomes the
    * value. Patterns with no match in the path are SKIPPED, not raised
    * (reference path_utils.metadata :142 documented semantics).
    */
  def metadata(path: String, patterns: (String, String)*): Map[String, String] =
    patterns.flatMap { case (name, pattern) =>
      val re = pattern.r
      re.findFirstMatchIn(path).map { m =>
        require(m.groupCount == 1, s"pattern $pattern must contain exactly one group")
        name -> m.group(1)
      }
    }.toMap

  /** The distributed bridge: list two globs, pair them by `pattern`,
    * return (key, data_path, other_path) as a DataFrame ready to join
    * against a fleet read (the multi-recording EDF + annotation ingest
    * shape).
    */
  def pairedTable(
      spark: org.apache.spark.sql.SparkSession,
      dataDir: String,
      dataSuffix: String,
      otherDir: String,
      otherSuffix: String,
      pattern: String
  ): org.apache.spark.sql.DataFrame = {
    def ls(dir: String, suffix: String): Seq[String] = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(suffix))
        .map(_.getAbsolutePath)
        .sorted
        .toSeq
    }
    val re = pattern.r
    import spark.implicits._
    reMatch(ls(dataDir, dataSuffix), ls(otherDir, otherSuffix), pattern)
      .map { case (p, o) => (re.findFirstIn(stem(p)).get, p, o) }
      .toDF("key", "data_path", "other_path")
  }
}
