package graft

import org.apache.spark.sql.functions._
import graft.data.Hashing

class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("native md5_hash60 is bit-identical to conv(substring(md5)) on real shingle-like data") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("s"))
      .filter($"s" =!= "")
      .limit(5000)
    val diff = docs
      .withColumn("a", Hashing.hash60($"s"))
      .withColumn("b", Hashing.hash60Builtin($"s"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
    // plus a few adversarial inputs (empty, unicode, long)
    val edge = Seq("", "√unicode≠", "x" * 10000, "0", "\n\t").toDF("s")
    val ediff = edge
      .withColumn("a", Hashing.hash60($"s"))
      .withColumn("b", Hashing.hash60Builtin($"s"))
      .filter($"a" =!= $"b")
    assert(ediff.count() === 0)
  }

  test("GraftExtensions registers SQL functions on a session built with withExtensions") {
    // the shared context already exists; applying the extensions object to a
    // fresh SparkSessionExtensions verifies the injection wiring, and the
    // temp-function path verifies SQL execution end to end
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT cosine_sim(array(1.0F,0.0F), array(0.0F,1.0F)) AS c").as[Double].head()
    assert(math.abs(got) < 1e-15)
    val sh = spark.sql(
      "SELECT size(shingle_hash60(array('a','b','c','d'), 3)) AS n, embed_stats(array(3.0D,4.0D)).norm AS nrm")
      .as[(Int, Double)].head()
    assert(sh === ((2, 5.0)))
    val md = spark.sql("SELECT md5_hash60('') AS h, simhash60(array(CAST(7 AS BIGINT))) AS s")
      .as[(Long, Long)].head()
    assert(md._1 === graft.functions.Md5Hash60.hash(Array.emptyByteArray) && md._2 === 7L)
  }
}
