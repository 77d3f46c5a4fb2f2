package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization (cosine → dot product, the precondition for most ANN
  * indexes) and symmetric int8 quantization (4× storage/bandwidth cut for
  * the 100 TB embedding store; dequantize on read).
  *
  * All pure column expressions with fixed fold orders (oracle
  * bit-parity); math in double.
  */
object Embeddings {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** L2 norm, left-to-right accumulation. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(toDouble(v), lit(0.0), (acc, x) => acc + x * x))

  /** Unit-length vector (zero vectors pass through as zeros). */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(toDouble(v), x => when(n === 0.0, 0.0).otherwise(x / n))
  }

  /** Symmetric int8 quantization: scale = maxAbs/127, q_i = round(x_i/scale).
    * Returns struct(scale, q array<int>). maxAbs via a left-to-right fold.
    */
  def quantizeInt8(v: Column): Column = {
    val d = toDouble(v)
    val maxAbs = aggregate(d, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = maxAbs / 127.0
    struct(
      scale.as("scale"),
      transform(d, x => when(scale === 0.0, 0).otherwise(round(x / scale).cast("int"))).as("q")
    )
  }

  /** Dequantize back to doubles: x_i ≈ q_i * scale. */
  def dequantize(qstruct: Column): Column =
    transform(qstruct.getField("q"), q => q.cast("double") * qstruct.getField("scale"))

  /** Max absolute reconstruction error of quantize→dequantize (bounded by
    * scale/2) — the quantization-quality metric.
    */
  def reconstructionError(v: Column): Column = {
    val deq = dequantize(quantizeInt8(v))
    aggregate(
      zip_with(toDouble(v), deq, (a, b) => abs(a - b)),
      lit(0.0),
      (acc, x) => greatest(acc, x)
    )
  }
}
