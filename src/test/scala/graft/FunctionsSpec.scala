package graft

import org.apache.spark.sql.functions._
import graft.data.Similarity
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim is bit-identical to the HOF formulation on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf).limit(50)
    val a = emb.select($"vec_id".as("i"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("j"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"i" < $"j")
    val diff = pairs
      .withColumn("c1", Similarity.cosine($"va", $"vb"))
      .withColumn("c2", Similarity.cosineHof($"va", $"vb"))
      .filter($"c1" =!= $"c2") // exact comparison: any ULP difference fails
    assert(diff.count() === 0)
  }

  test("native int_dot equals the HOF fold on quantized embeddings; codegen'd; SQL-registered") {
    val codes = graft.core.Tables.embeddings(spark, sf).limit(60)
      .select($"vec_id", graft.data.Embeddings.quantizeInt8($"embedding").getField("q").as("q"))
    val a = codes.select($"vec_id".as("i"), $"q".as("qa"))
    val b = codes.select($"vec_id".as("j"), $"q".as("qb"))
    val hof = aggregate(
      zip_with($"qa", $"qb", (x, y) => (x * y).cast("long")), lit(0L), (acc, x) => acc + x)
    val pairs = a.crossJoin(b).filter($"i" < $"j")
      .withColumn("fused", graft.functions.IntDotProduct.column($"qa", $"qb"))
      .withColumn("hof", hof)
    assert(pairs.filter($"fused" =!= $"hof").count() === 0)
    // no CodegenFallback marker: the expression compiles into the stage
    // (the cross-join harness itself is BNL, so don't assert stage shape)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(1500))
    // SQL registration + null propagation
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT int_dot(array(1, -2, 3), array(4, 5, 6)) AS d").head().getLong(0) === 12L)
    val nullGot = Seq((Some(Seq(1, 2)), Option.empty[Seq[Int]])).toDF("a", "b")
      .selectExpr("int_dot(a, b) AS d").head()
    assert(nullGot.isNullAt(0))
    // ragged arrays null the whole sum — same answer as the zip_with HOF,
    // so the SQL-registered face has no common-prefix surprise (both the
    // literal/interpreted path and the column/codegen path)
    assert(spark.sql("SELECT int_dot(array(1, 2, 3), array(4, 5)) AS d").head().isNullAt(0))
    val ragged = Seq((Seq(1, 2, 3), Seq(4, 5))).toDF("a", "b")
      .withColumn("d", graft.functions.IntDotProduct.column($"a", $"b"))
      .withColumn("hofd", aggregate(
        zip_with($"a", $"b", (x, y) => (x * y).cast("long")), lit(0L), (acc, x) => acc + x))
      .head()
    assert(ragged.isNullAt(2) && ragged.isNullAt(3))
  }

  test("native PqEncode/PqLut are bit-identical to the HOF formulation on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
    // encode: same argmax codes (incl. tie/NaN contract) per subspace
    val encDiff = emb
      .withColumn("fused", Similarity.pqEncode($"embedding", cbs))
      .withColumn("hof", Similarity.pqEncodeHof($"embedding", cbs))
      .filter($"fused" =!= $"hof")
    assert(encDiff.count() === 0)
    // lut: flattened m·k dots equal the per-subspace HOF dot folds exactly
    val sub = cbs.head.head.length
    val hofLut = flatten(array(cbs.zipWithIndex.map { case (cb, mi) =>
      val qv = slice($"embedding".cast("array<double>"), mi * sub + 1, sub)
      array(cb.map { cw =>
        aggregate(
          zip_with(transform(qv, x => x.cast("double")), array(cw.map(lit): _*), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*))
    val lutDiff = emb
      .withColumn("fused", graft.functions.Pq.lut($"embedding", cbs))
      .withColumn("hof", hofLut)
      .filter($"fused" =!= $"hof") // exact: any ULP difference fails
    assert(lutDiff.count() === 0)
    // both stay codegen'd
    val plan = emb.select(
      Similarity.pqEncode($"embedding", cbs).as("e"),
      graft.functions.Pq.lut($"embedding", cbs).as("l"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }

  test("PqEncode nearest mode: bit-identical to the biased HOF, differs from raw dot on trained codebooks") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // TRAINED codebooks: mean codewords with unequal norms — the regime
    // the nearest encode exists for (seeded slices are near-equal-norm,
    // where dot and nearest argmax mostly coincide and a bias bug could
    // hide)
    val cbs = Similarity.pqCodebooksTrainedDet(
      emb, "vec_id", "embedding", m = 8, k = 16, iters = 2,
      sampleN = Similarity.imiTrainSampleN(16))
    val encDiff = emb
      .withColumn("fused", Similarity.pqEncode($"embedding", cbs, nearest = true))
      .withColumn("hof", Similarity.pqEncodeHof($"embedding", cbs, nearest = true))
      .filter($"fused" =!= $"hof")
    assert(encDiff.count() === 0)
    // the bias is load-bearing: nearest and raw-dot encodes must actually
    // disagree somewhere on trained codebooks, else this test proves nothing
    val modeDiff = emb
      .withColumn("near", Similarity.pqEncode($"embedding", cbs, nearest = true))
      .withColumn("dot", Similarity.pqEncode($"embedding", cbs))
      .filter($"near" =!= $"dot")
    assert(modeDiff.count() > 0, "nearest encode never disagreed with raw-dot encode")
    val plan = emb.select(Similarity.pqEncode($"embedding", cbs, nearest = true).as("e"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }

  test("PqResidual: bit-identical to the HOF formulation; projection residuals shrink the norm") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val icbs = Similarity.imiCodebooks(emb, "vec_id", "embedding", kSub = 4)
    val diff = emb
      .withColumn("fused", Similarity.imiResidual($"embedding", icbs))
      .withColumn("hof", Similarity.pqResidualHof($"embedding", icbs))
      .filter($"fused" =!= $"hof") // exact: any ULP difference fails
    assert(diff.count() === 0)
    // the subtracted center is the imiAssign CELL's center (the HOF above
    // pins the per-half argmax contract); residual norms must sit well
    // under the raw norms — the property the IVFADC face exists for
    val norms = emb
      .withColumn("_r", Similarity.imiResidual($"embedding", icbs))
      .select(
        sqrt(aggregate(transform($"embedding".cast("array<double>"), x => x * x),
          lit(0.0), (a, x) => a + x)).as("vn"),
        sqrt(aggregate(transform($"_r", x => x * x), lit(0.0), (a, x) => a + x)).as("rn"))
      .agg(avg($"vn"), avg($"rn")).as[(Double, Double)].head()
    assert(norms._2 < norms._1,
      f"mean residual norm ${norms._2}%.3f not below mean vector norm ${norms._1}%.3f")
    val plan = emb.select(Similarity.imiResidual($"embedding", icbs).as("r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }

  test("ShingleHash60 is bit-identical to the HOF shingles+hash formulation on real docs") {
    val toks = graft.data.TextAnalysis.tokens($"text")
    val hof = transform(graft.data.Dedup.shingles(toks, 3), s => graft.data.Hashing.hash60(s))
    val diff = graft.core.Tables.documents(spark, sf)
      .withColumn("fused", graft.functions.ShingleHash60(toks, 3))
      .withColumn("hof", hof)
      .filter($"fused" =!= $"hof") // element AND order equality
    assert(diff.count() === 0)
    // degenerate shapes: shorter-than-n docs collapse to one shingle,
    // empty text to the empty-string shingle — same as the HOF path
    val edge = Seq("a b", "a", "").toDF("text")
      .withColumn("fused", graft.functions.ShingleHash60(graft.data.TextAnalysis.tokens($"text"), 3))
      .withColumn("hof", transform(
        graft.data.Dedup.shingles(graft.data.TextAnalysis.tokens($"text"), 3),
        s => graft.data.Hashing.hash60(s)))
      .filter($"fused" =!= $"hof")
    assert(edge.count() === 0)
  }

  test("MinHashSig (shuffle-free) matches the explode+groupBy aggregate formulation") {
    import graft.data.{Dedup, TextAnalysis}
    val docs = graft.core.Tables.documents(spark, sf)
    val fused = Dedup.minhashSignatures(docs, "doc_id", "text")
    // the original shuffle shape: explode shingle hashes, k min-aggregates
    val rows = docs.select(
      $"doc_id".as("sid"),
      explode(graft.functions.ShingleHash60(TextAnalysis.tokens($"text"), 3)).as("sh"))
      .withColumn("_h", $"sh" % Dedup.MinhashP)
    val aggs = (0 until 16).map(i =>
      min((lit(Dedup.minhashA(i)) * $"_h" + lit(Dedup.minhashB(i))) % Dedup.MinhashP).as(s"h$i"))
    val shuffled = rows.groupBy($"sid").agg(aggs.head, aggs.tail: _*)
    val cols = (0 until 16).map(i => s"h$i")
    val joined = fused.as("f").join(shuffled.as("s"), "sid")
    val mismatched = cols.map(c => (col(s"f.$c") =!= col(s"s.$c")).cast("int"))
      .reduce(_ + _)
    assert(joined.filter(mismatched > 0).count() === 0)
    assert(fused.count() === shuffled.count())
  }

  test("cosine_sim registered for SQL") {
    GraftFunctions.register(spark)
    val got = spark
      .sql("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .as[Double]
      .head()
    assert(math.abs(got - 1.0) < 1e-15)
  }

  test("cosine_sim null input yields null, type mismatch rejected") {
    val df = Seq((Seq(1f, 2f), null.asInstanceOf[Seq[Float]])).toDF("a", "b")
    val got = df.select(GraftFunctions.cosine_sim($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq((1, "x")).toDF("a", "b").select(GraftFunctions.cosine_sim($"a", $"b")).collect()
    }
  }

  test("cosine_sim participates in whole-stage codegen") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val plan = emb
      .select(GraftFunctions.cosine_sim($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan.toString
    // no CodegenFallback marker: expression compiles into the stage
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }
}
