package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput profiler at synthetic scale: 16M samples × 8 channels
  * (160× the sf0.1 signal) — validates that the marginal per-sample
  * costs measured in BASELINE.md hold through a two-orders-of-magnitude
  * scale-up, i.e. that no kernel hides an O(n²) or a memory cliff.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nPerCh = sys.env.getOrElse("PROF_N", "2000000").toLong
    val nCh = 8
    // deterministic synthetic signal, generated distributed
    val sig = spark.range(nPerCh * nCh)
      .select(
        concat(lit("ch"), (col("id") % nCh)).as("channel"),
        (col("id") / nCh).cast("bigint").as("n"),
        (sin(col("id") / 7.0) * 10.0 + sin(col("id") / 1311.0) * 3.0).as("x")
      )
    sig.persist()
    val total = sig.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-22s ${sec}%7.2f s  ${total / sec / 1e6}%8.2f Msamples/s  rows=$rows")
    }
    // channel-partitioned, (channel, n)-sorted copy — what Signal.long
    // hands the gate queries; isolates kernel+codec from the exchange
    val sigSorted = sig.repartition(col("channel"))
      .sortWithinPartitions(col("channel"), col("n")).persist()
    sigSorted.count()
    t("warmup")(sig.limit(1000).count())
    val h75 = operators.HilbertOps.hilbertH
    t("convPlus_75tap")(operators.FirOps.convPlus(sig, h75).count())
    t("sosfilt_butter")(operators.IirOps.sosfilt(sig, operators.IirOps.butterLp).count())
    t("sosfilt_presorted")(
      operators.IirOps.sosfilt(sigSorted, operators.IirOps.butterLp, presorted = true).count()
    )
    t("sosfiltfilt_presorted")(
      operators.IirOps.sosfiltfilt(sigSorted, operators.IirOps.butterLp, presorted = true).count()
    )
    t("psd_welch_presorted")(
      operators.SpectraOps.psdWelch(sigSorted, presorted = true).count()
    )
    t("polyResample_3_2")(operators.ResampleOps.polyResample(sig, 3, 2, operators.ResampleOps.hRes32).count())
    t("psd_welch_fft")(operators.SpectraOps.psdWelch(sig).count())
    t("stft64_fft")(operators.SpectraOps.stft(sig).count())
    t("hilbert_env")(operators.HilbertOps.hilbertEnv(sig).count())
    spark.stop()
  }
}
