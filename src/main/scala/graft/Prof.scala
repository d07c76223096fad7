package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val sig = graft.core.Signal.long(spark, dir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    t("warmup")(spark.range(100000).count())
    t("sig")(sig.count())
    t("fir_phaseBand")(sig.filter(org.apache.spark.sql.functions.col("channel") === "click")
      .select(org.apache.spark.sql.functions.col("n"),
        graft.operators.FirOps.sameExpr(graft.operators.HilbertOps.phaseBandH).as("x")).count())
    t("taps")( (graft.operators.HilbertOps.phaseBandH.length.toLong) )
    t("taps_amp")( (graft.operators.HilbertOps.ampBandH.length.toLong) )
    t("taps_hil")( (graft.operators.HilbertOps.hilbertH.length.toLong) )
    t("phase_power")(graft.operators.HilbertOps.phasePower(sig).count())
    t("phase_power_2nd")(graft.operators.HilbertOps.phasePower(sig).count())
    t("phase_power_sig")(graft.operators.HilbertOps.phasePowerSig(sig).count())
    spark.stop()
  }
}
