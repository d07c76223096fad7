package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EDF (European Data Format) reader/writer.
  *
  * Format re-implemented from the public EDF specification (Kemp et al.,
  * edfplus.info): 256-byte fixed header + 256 bytes per signal of ASCII
  * fields, then data records of little-endian int16 samples per signal,
  * mapped to physical units by the per-signal linear gain
  * slope = (physMax−physMin)/(digMax−digMin), offset = physMin −
  * slope·digMin — the same mapping the reference applies
  * (openseize `file_io/edf.py:317` Reader._decipher).
  *
  * Spark integration: `readSpark` parallelizes at file granularity via
  * `binaryFiles` (a 100 TB EEG corpus is thousands of recordings — file
  * parallelism is the natural partitioning; per-file record parsing
  * streams inside the executor). The writer is a driver-side sink like
  * the reference's Writer, plus a `splitter` producing per-channel-group
  * files (edf.py:780).
  */
object Edf {

  final case class Header(
      nRecords: Int,
      recordDuration: Double,
      labels: Vector[String],
      physMin: Vector[Double],
      physMax: Vector[Double],
      digMin: Vector[Int],
      digMax: Vector[Int],
      samplesPerRecord: Vector[Int]
  ) {
    def nSignals: Int = labels.length
    def headerBytes: Int = 256 * (nSignals + 1)
    def recordBytes: Int = samplesPerRecord.sum * 2
    def slope(i: Int): Double = (physMax(i) - physMin(i)) / (digMax(i) - digMin(i))
    def offset(i: Int): Double = physMin(i) - slope(i) * digMin(i)
  }

  private def pad(s: String, n: Int): Array[Byte] = {
    val t = if (s.length > n) s.substring(0, n) else s + (" " * (n - s.length))
    t.getBytes(StandardCharsets.US_ASCII)
  }

  private def num(d: Double, n: Int): Array[Byte] = {
    val s = if (d == d.toLong.toDouble) d.toLong.toString else f"$d%.4f"
    pad(s, n)
  }

  /** Write channels (label → samples) as one EDF file. Samples are
    * quantized to int16 over each channel's [min, max] physical range.
    */
  def write(
      path: String,
      channels: Seq[(String, Array[Double])],
      fs: Double,
      samplesPerRecord: Int = 256
  ): Header = {
    require(channels.nonEmpty)
    val len = channels.head._2.length
    require(channels.forall(_._2.length == len), "equal channel lengths required")
    val spr = samplesPerRecord
    val nRecords = len / spr
    require(nRecords * spr == len, s"length $len not a multiple of $spr")
    val physMin = channels.map(_._2.min).toVector
    val physMax = channels.map { case (_, xs) => math.max(xs.max, xs.min + 1e-9) }.toVector
    val hdr = Header(
      nRecords,
      spr / fs,
      channels.map(_._1).toVector,
      physMin,
      physMax,
      Vector.fill(channels.length)(-32768),
      Vector.fill(channels.length)(32767),
      Vector.fill(channels.length)(spr)
    )
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.write(pad("0", 8))
      out.write(pad("graft patient", 80))
      out.write(pad("graft recording", 80))
      out.write(pad("01.01.24", 8))
      out.write(pad("00.00.00", 8))
      out.write(num(hdr.headerBytes.toDouble, 8))
      out.write(pad("", 44))
      out.write(num(nRecords.toDouble, 8))
      out.write(num(hdr.recordDuration, 8))
      out.write(pad(channels.length.toString, 4))
      def field(n: Int, f: Int => String): Unit =
        (0 until channels.length).foreach(i => out.write(pad(f(i), n)))
      field(16, i => hdr.labels(i))
      field(80, _ => "")
      field(8, _ => "uV")
      field(8, i => num(hdr.physMin(i), 8).map(_.toChar).mkString.trim)
      field(8, i => num(hdr.physMax(i), 8).map(_.toChar).mkString.trim)
      field(8, i => hdr.digMin(i).toString)
      field(8, i => hdr.digMax(i).toString)
      field(80, _ => "")
      field(8, _ => spr.toString)
      field(32, _ => "")
      // data records
      val buf = ByteBuffer.allocate(hdr.recordBytes).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until nRecords) {
        buf.clear()
        for (i <- channels.indices) {
          val xs = channels(i)._2
          val s = hdr.slope(i); val o = hdr.offset(i)
          var j = r * spr
          while (j < (r + 1) * spr) {
            val dig = math.max(-32768, math.min(32767, math.round((xs(j) - o) / s))).toInt
            buf.putShort(dig.toShort)
            j += 1
          }
        }
        out.write(buf.array(), 0, hdr.recordBytes)
      }
    } finally out.close()
    hdr
  }

  /** Parse the ASCII header of an EDF byte array. */
  def parseHeader(bytes: Array[Byte]): Header = {
    def str(off: Int, n: Int) = new String(bytes, off, n, StandardCharsets.US_ASCII).trim
    val nSignals = str(252, 4).toInt
    val nRecords = str(236, 8).toInt
    val recDur = str(244, 8).toDouble
    def sigField(base: Int, width: Int): Vector[String] =
      (0 until nSignals).map(i => str(256 + base * nSignals + i * width, width)).toVector
    val labels = sigField(0, 16)
    val physMin = sigField(16 + 80 + 8, 8).map(_.toDouble)
    val physMax = sigField(16 + 80 + 8 + 8, 8).map(_.toDouble)
    val digMin = sigField(16 + 80 + 8 + 16, 8).map(_.toDouble.toInt)
    val digMax = sigField(16 + 80 + 8 + 24, 8).map(_.toDouble.toInt)
    val spr = sigField(16 + 80 + 8 + 32 + 80, 8).map(_.toInt)
    Header(nRecords, recDur, labels, physMin, physMax, digMin, digMax, spr)
  }

  /** Decode one file's bytes to (channel, n, x) triples. */
  def decode(bytes: Array[Byte]): Iterator[(String, Long, Double)] = {
    val hdr = parseHeader(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    for {
      r <- (0 until hdr.nRecords).iterator
      i <- hdr.labels.indices.iterator
      j <- (0 until hdr.samplesPerRecord(i)).iterator
    } yield {
      val off = hdr.headerBytes + r * hdr.recordBytes +
        hdr.samplesPerRecord.take(i).sum * 2 + j * 2
      val dig = bb.getShort(off).toDouble
      (hdr.labels(i), r.toLong * hdr.samplesPerRecord(i) + j, hdr.slope(i) * dig + hdr.offset(i))
    }
  }

  /** Distributed EDF read: one task per file, records parsed in
    * executors → DataFrame (src, channel, n, x).
    */
  def readSpark(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(pathGlob)
      .flatMap { case (name, pds) =>
        decode(pds.toArray()).map { case (ch, n, x) => (name, ch, n, x) }
      }
      .toDF("src", "channel", "n", "x")
  }

  /** Reference `splitter` (edf.py:780): split an EDF into per-channel-
    * group files.
    */
  def splitter(inPath: String, groups: Seq[Seq[Int]], outPaths: Seq[String], fs: Double): Unit = {
    val bytes = Files.readAllBytes(Paths.get(inPath))
    val hdr = parseHeader(bytes)
    val chans = decode(bytes).toSeq.groupBy(_._1).map { case (ch, rows) =>
      ch -> rows.sortBy(_._2).map(_._3).toArray
    }
    groups.zip(outPaths).foreach { case (idxs, out) =>
      val sel = idxs.map(i => hdr.labels(i) -> chans(hdr.labels(i)))
      write(out, sel, hdr.samplesPerRecord.head / hdr.recordDuration, hdr.samplesPerRecord.head)
    }
  }
}
