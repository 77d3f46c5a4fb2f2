package graft

import org.apache.spark.sql.functions._
import graft.data.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("l2Normalize yields unit vectors; zero vector stays zero") {
    val df = Seq(Tuple1(Seq(3f, 4f)), Tuple1(Seq(0f, 0f))).toDF("v")
    val norms = df.select(Embeddings.l2Norm(Embeddings.l2Normalize($"v"))).as[Double].collect()
    assert(math.abs(norms(0) - 1.0) < 1e-12)
    assert(norms(1) === 0.0)
  }

  test("int8 quantization bounds reconstruction error by scale/2") {
    val df = graft.core.Tables.embeddings(spark, sf)
    val bad = df.select(
      Embeddings.reconstructionError($"embedding").as("err"),
      (Embeddings.quantizeInt8($"embedding").getField("scale") / 2 + 1e-12).as("bound")
    ).filter($"err" > $"bound")
    assert(bad.count() === 0)
    // quantized values stay in int8 range
    val outOfRange = df.select(explode(Embeddings.quantizeInt8($"embedding").getField("q")).as("q"))
      .filter($"q" > 127 || $"q" < -127)
    assert(outOfRange.count() === 0)
  }
}
