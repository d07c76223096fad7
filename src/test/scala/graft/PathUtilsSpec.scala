package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PathUtils

/** Reference path_utils parity (file_io/path_utils.py doctest cases). */
class PathUtilsSpec extends AnyFunSuite {
  import TestSpark._

  test("reMatch pairs fleets by the shared stem key (reference doctest)") {
    val paths = Seq("test_01_a.edf", "test_02_b.edf")
    val others = Seq("test_01.txt", "test_02.txt")
    val got = PathUtils.reMatch(paths, others, """\w+_\d+""")
    assert(got == Seq("test_01_a.edf" -> "test_01.txt", "test_02_b.edf" -> "test_02.txt"))
  }

  test("reMatch rejects length mismatch, missing pattern, and ambiguous keys") {
    intercept[IllegalArgumentException](PathUtils.reMatch(Seq("a_1.edf"), Seq(), """\d+"""))
    intercept[IllegalArgumentException](
      PathUtils.reMatch(Seq("a_1.edf"), Seq("nodigits.txt"), """\d+""")
    )
    intercept[IllegalArgumentException](
      PathUtils.reMatch(Seq("a_1.edf", "b_1.edf"), Seq("c_1.txt", "d_1.txt"), """\d+""")
    )
  }

  test("mismatched returns the symmetric difference of stems (reference doctest)") {
    val got = PathUtils.mismatched(
      Seq("test_01.edf", "test_02_b.edf"),
      Seq("test_01.txt", "test_02.text")
    )
    assert(got == Set("test_02", "test_02_b"))
  }

  test("rename replaces the substring in file names in place (reference doctest)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rename").toFile
    val files = Seq("ts_1.edf", "ts_2.edf").map { n =>
      val f = new java.io.File(dir, n)
      f.createNewFile()
      f.getAbsolutePath
    }
    PathUtils.rename(files, "ts", "demo")
    val names = dir.listFiles().map(_.getName).sorted.toSeq
    assert(names == Seq("demo_1.edf", "demo_2.edf"))
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  test("metadata extracts single-group named patterns from a path") {
    val md = PathUtils.metadata(
      "/data/cohort_12/mouse_07_rec.edf",
      "cohort" -> """cohort_(\d+)""",
      "mouse" -> """mouse_(\d+)"""
    )
    assert(md == Map("cohort" -> "12", "mouse" -> "07"))
    // reference :142: missing patterns are SKIPPED, not raised
    assert(PathUtils.metadata("/x/y.edf", "absent" -> """zzz_(\d+)""") == Map.empty)
  }

  test("rename matches across the full path string (reference :102 semantics)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mvdir")
    val src = java.nio.file.Files.createDirectory(base.resolve("batchA")).toFile
    val dst = java.nio.file.Files.createDirectory(base.resolve("batchB")).toFile
    val f = new java.io.File(src, "rec.edf"); f.createNewFile()
    PathUtils.rename(Seq(f.getAbsolutePath), "batchA", "batchB")
    assert(!f.exists() && new java.io.File(dst, "rec.edf").exists())
    dst.listFiles().foreach(_.delete()); src.delete(); dst.delete(); base.toFile.delete()
  }

  test("pairedTable pairs two real directories into a keyed DataFrame") {
    val base = java.nio.file.Files.createTempDirectory("graft_fleet")
    val dData = java.nio.file.Files.createDirectory(base.resolve("edf")).toFile
    val dAnno = java.nio.file.Files.createDirectory(base.resolve("txt")).toFile
    Seq("rec_01_x.edf", "rec_02_y.edf").foreach(n => new java.io.File(dData, n).createNewFile())
    Seq("rec_01.txt", "rec_02.txt").foreach(n => new java.io.File(dAnno, n).createNewFile())
    val df = PathUtils
      .pairedTable(spark, dData.getAbsolutePath, ".edf", dAnno.getAbsolutePath, ".txt", """rec_\d+""")
      .collect()
      .map(r => (r.getString(0), new java.io.File(r.getString(1)).getName, new java.io.File(r.getString(2)).getName))
      .sortBy(_._1)
    assert(df.toSeq == Seq(
      ("rec_01", "rec_01_x.edf", "rec_01.txt"),
      ("rec_02", "rec_02_y.edf", "rec_02.txt")
    ))
    (dData.listFiles() ++ dAnno.listFiles()).foreach(_.delete())
    dData.delete(); dAnno.delete(); base.toFile.delete()
  }
}
