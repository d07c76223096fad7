package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst expressions for the segmented fast paths (preference
  * tier (b): a native Expression beats a UDF — no Row boxing, typed
  * ArrayData in/out, composes with any plan).
  *
  * Both kernels are per-row pure functions over `array<double>` segments
  * assembled by a single channel-partitioned groupBy, so the expensive
  * O(n·M) / O(n·nfft) inner loops of the lag-sum formulations collapse
  * to O(n log n) FFT work executed entirely inside the executor.
  */

/** |RFFT(x)|² over a 2^k-length segment → array of n/2+1 bin powers
  * (the periodogram core; window/detrend are applied by the caller).
  */
case class RfftMag2(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(Fft.rfftMag2(arr))
  }
  override protected def withNewChildInternal(c: Expression): RfftMag2 = copy(child = c)
}

/** FFT linear convolution of a segment with a fixed kernel; emits the
  * full (len + M − 1) convolution — the caller slices the core region
  * (overlap-add/overlap-save assembly).
  */
case class SegConv(child: Expression, kernel: Seq[Double]) extends UnaryExpression with CodegenFallback {
  @transient private lazy val h = kernel.toArray
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(Fft.convolve(arr, h))
  }
  override protected def withNewChildInternal(c: Expression): SegConv = copy(child = c)
}

object exprs {
  def rfft_mag2(c: Column): Column =
    Bridge.column(RfftMag2(Bridge.expression(c)))
  def seg_conv(c: Column, h: Array[Double]): Column =
    Bridge.column(SegConv(Bridge.expression(c), h.toSeq))
}
