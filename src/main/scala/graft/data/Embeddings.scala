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

  /** The int8 scale alone: maxAbs/127 (left-to-right greatest fold). Pair
    * with [[int8Codes]] via a pinned column when quantizing in bulk —
    * embedding the scale INSIDE the per-element rounding lambda (as the
    * one-shot [[quantizeInt8]] struct does) re-runs the maxAbs fold per
    * element: O(dim²) per row.
    */
  def int8Scale(v: Column): Column =
    aggregate(toDouble(v), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0

  /** Codes for a PRE-COMPUTED scale column (see [[int8Scale]]): one fold +
    * one transform per row. `scale` must be a plain attribute (pin it with
    * [[graft.functions.ComputeOnce]] so CollapseProject cannot substitute
    * the fold back into this lambda).
    */
  def int8Codes(v: Column, scale: Column): Column =
    transform(toDouble(v), x => when(scale === 0.0, 0).otherwise(round(x / scale).cast("int")))

  /** Symmetric int8 quantization: scale = maxAbs/127, q_i = round(x_i/scale).
    * Returns struct(scale, q array<int>). maxAbs via a left-to-right fold.
    * NOTE O(dim²) per row as a single expression (scale re-evaluated per
    * element) — fine for stats/spot use; bulk paths use
    * [[int8Scale]]/[[int8Codes]] (or the fused native
    * [[graft.functions.EmbedStats]]).
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
