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

  test("EmbedStats native expression matches the HOF formulations bit-for-bit") {
    val v = $"embedding"
    val s = graft.functions.EmbedStats(v)
    val mismatches = graft.core.Tables.embeddings(spark, sf)
      .select(
        $"vec_id",
        s.getField("norm").as("f_norm"),
        s.getField("n1").as("f_n1"),
        s.getField("q_scale").as("f_scale"),
        s.getField("q1").as("f_q1"),
        s.getField("max_err").as("f_err"),
        Embeddings.l2Norm(v).as("h_norm"),
        element_at(Embeddings.l2Normalize(v), 1).as("h_n1"),
        Embeddings.quantizeInt8(v).getField("scale").as("h_scale"),
        element_at(Embeddings.quantizeInt8(v).getField("q"), 1).as("h_q1"),
        Embeddings.reconstructionError(v).as("h_err"))
      .filter(
        $"f_norm" =!= $"h_norm" || $"f_n1" =!= $"h_n1" || $"f_scale" =!= $"h_scale" ||
          $"f_q1" =!= $"h_q1" || $"f_err" =!= $"h_err")
    assert(mismatches.count() === 0)
  }

  test("EmbedStats rounding is HALF_UP like Spark round (negative ties away from zero)") {
    // -0.5/scale lands on a tie: Math.round would floor it to 0, HALF_UP -> -1
    val df = Seq(Tuple1(Seq(-63.5, 127.0))).toDF("v")
    val q1 = df.select(graft.functions.EmbedStats($"v").getField("q1")).as[Int].head()
    val oracle = df.select(round($"v" (0) / (lit(127.0) / 127.0)).cast("int")).as[Int].head()
    assert(q1 === oracle && q1 === -64)
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
