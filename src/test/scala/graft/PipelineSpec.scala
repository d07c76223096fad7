package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.PipelineOps

/** Composition-level checks for the tutorial EEG workflow gate query
  * (notch → decimate → CAR re-reference → epoch → band power). The
  * DuckDB oracle proves cross-engine parity; these assert the PHYSICS
  * the oracle can't see: epochs are complete, powers are finite and
  * non-negative, and the CAR stage actually zero-centers each sample.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("eeg_workflow emits complete non-negative epochs for every channel") {
    val out = PipelineOps.queries("eeg_workflow")(spark, sf).localCheckpoint()
    val n = out.count()
    assert(n > 0)
    // every (epoch, channel) pair appears exactly once
    assert(out.groupBy("epoch_id", "channel").count().filter(col("count") =!= 1).isEmpty)
    // band power is a sum of squares / N^2 — finite, >= 0
    val bad = out.filter(col("band_power").isNull || col("band_power") < 0.0 || isnan(col("band_power")))
    assert(bad.isEmpty)
    // every channel epochs at least one event (channels have different
    // lengths, so high-center edge epochs may exist only on longer ones)
    val perChannel = out.groupBy("channel").agg(countDistinct("epoch_id").as("ne"))
    assert(perChannel.filter(col("ne") < 1).isEmpty)
  }

  test("integer-micro CAR zero-centers each decimated sample across channels") {
    // rebuild through the first three stages only and check sum_channels(x) ≈ 0
    // per n (the re-reference invariant); tolerance = nch rounding steps
    import graft.core.{Dsp, Signal}
    import graft.operators.{IirOps, ResampleOps}
    val sig = Signal.long(spark, sf)
    val nf = IirOps
      .sosfilt(sig, IirOps.notch15, presorted = true)
      .select(col("channel"), col("n"), Dsp.round6(col("y")).as("x"))
    val ds = ResampleOps
      .downsample(nf, 2, ResampleOps.hDown2, presorted = true)
      .select(col("channel"), col("n"), col("y").as("x"))
    val mic = ds.withColumn("m", floor(col("x") * lit(1e6) + lit(0.5)).cast("long"))
    val sums = mic.groupBy(col("n")).agg(sum(col("m")).as("sm"), count(lit(1)).as("nch"))
    val rr = mic
      .join(sums, Seq("n"))
      .select(
        col("n"),
        col("nch"),
        Dsp.round6(
          (col("m") * col("nch") - col("sm")).cast("double") /
            (col("nch").cast("double") * lit(1e6))
        ).as("x")
      )
    val worst = rr
      .groupBy(col("n"), col("nch"))
      .agg(abs(sum(col("x"))).as("resid"))
      .agg(max(col("resid") - col("nch").cast("double") * lit(1e-6)).as("over"))
      .head()
      .getDouble(0)
    assert(worst <= 0.0, s"CAR residual exceeds rounding tolerance by $worst")
  }
}
