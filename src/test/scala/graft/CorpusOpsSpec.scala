package graft

import org.apache.spark.sql.functions._
import graft.data.CorpusOps

object CorpusOpsSpecHelpers {
  def labels(df: org.apache.spark.sql.DataFrame): Map[Long, String] = {
    import df.sparkSession.implicits._
    df.select($"doc_id", $"split").as[(Long, String)].collect().toMap
  }
}

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights: target-vocab docs outrank raw-vocab docs; smoothing keeps unseen grams finite; empty doc safe") {
    // planted domains: target docs (src 't') speak vocab A, background
    // ('r') speaks vocab B; probes mix them in known proportions
    val a = "alpha beta gamma delta epsilon"
    val b = "zulu yankee xray whiskey victor"
    val docs = (
      (1L to 4L).map(i => (i, a, "t")) ++
      (11L to 18L).map(i => (i, b, "r")) ++
      Seq(
        (30L, a, "r"),                                   // pure target vocab, raw doc
        (31L, "alpha beta zulu yankee victor", "r"),     // mixed
        (32L, b, "r"),                                   // pure background vocab
        (33L, "neverseen tokens entirely fresh here", "r"), // unseen grams
        (34L, "", "r"))                                  // empty doc
      ).toDF("doc_id", "text", "src")
    val w = CorpusOps.importanceWeights(docs, "doc_id", "text", col("src") === "t")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // every doc present, exact gram counts (maxN = 2: 5 unigrams + 4
    // bigrams), empty doc zeroed not null
    assert(w.size === docs.count())
    assert(w(30L)._1 === 9L && w(34L) === ((0L, 0L, 0L)))
    // the importance ORDER the face exists for: target-vocab > mixed >
    // background-vocab, on the per-gram mean
    assert(w(30L)._3 > w(31L)._3 && w(31L)._3 > w(32L)._3,
      s"mean weights must rank target-likeness: ${w(30L)} ${w(31L)} ${w(32L)}")
    // unseen grams: smoothed, finite, and below the target-vocab score
    assert(w(33L)._3 > 0L && w(33L)._3 < w(30L)._3)
    // deterministic across invocations (model collect + literal replay)
    val w2 = CorpusOps.importanceWeights(docs, "doc_id", "text", col("src") === "t")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(w === w2)
    // bucket-count flood guard: driver-resident model, loud ceiling
    val err = intercept[IllegalArgumentException] {
      CorpusOps.importanceWeights(docs, "doc_id", "text", col("src") === "t",
        nBuckets = (1 << 20) + 1)
    }
    assert(err.getMessage.contains("nBuckets"), err.getMessage)
    // campaign split: the serialized model round-trips through bytes (and
    // therefore ModelStore) to an identical scoring frame, and the bytes
    // themselves are deterministic (sorted entries)
    val bytes = CorpusOps.trainImportanceModel(docs, "text", col("src") === "t")
    val viaBytes = CorpusOps.importanceWeightsWith(docs, "doc_id", "text", bytes)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(viaBytes === w)
    assert(java.util.Arrays.equals(
      bytes, CorpusOps.trainImportanceModel(docs, "text", col("src") === "t")))
    // the scale contract: scoring is ONE scan — the model enters as plan
    // literals, so the physical plan must contain no Exchange at all
    val plan = CorpusOps.importanceWeightsWith(docs, "doc_id", "text", bytes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring scan must not shuffle:\n$plan")
    // stale-format bytes (pre-IMP2: no magic — the old header's nBuckets
    // lands where the magic is expected) must fail LOUDLY, never misparse
    val stale = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(4096); out.writeInt(3) // old layout: nBuckets, count, ...
      (0 until 3).foreach { i => out.writeLong(i.toLong); out.writeLong(2L); out.writeLong(1L) }
      out.flush(); bos.toByteArray
    }
    val staleErr = intercept[IllegalArgumentException] {
      CorpusOps.importanceWeightsWith(docs, "doc_id", "text", stale)
    }
    assert(staleErr.getMessage.contains("IMP2"), staleErr.getMessage)
    // truncated IMP2 bytes (count promises more entries than present) are
    // equally loud — the exact-length check, not a read-past-end error
    val truncated = bytes.dropRight(8)
    val truncErr = intercept[IllegalArgumentException] {
      CorpusOps.importanceWeightsWith(docs, "doc_id", "text", truncated)
    }
    assert(truncErr.getMessage.contains("bytes"), truncErr.getMessage)
  }

  test("importanceResample: exactly n draws, proportional ±1, partition-invariant, zero-weight never drawn") {
    val w = Seq(
      (1L, 500L), (2L, 250L), (3L, 125L), (4L, 125L),
      (5L, 0L), (6L, 1L), (7L, 999L)
    ).toDF("doc_id", "w")
    val n = 40L
    val total = 2000L
    val out = CorpusOps.importanceResample(w, "doc_id", "w", n, "spec-seed")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the telescoping contract: the draw counts sum to EXACTLY n
    assert(out.values.map(_._2).sum === n)
    // zero-weight doc never drawn
    assert(!out.contains(5L))
    // systematic sampling puts each doc within 1 of its proportional share
    out.foreach { case (id, (wi, d)) =>
      val exact = n.toDouble * wi / total
      assert(math.abs(d - exact) <= 1.0, s"doc $id: $d draws vs proportional $exact")
    }
    // deterministic, and INVARIANT to the partition count — pins the
    // distributed prefix-sum (range shuffle + per-partition offsets)
    val p1 = CorpusOps.importanceResample(w.repartition(5), "doc_id", "w", n, "spec-seed", nParts = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val p7 = CorpusOps.importanceResample(w.repartition(3), "doc_id", "w", n, "spec-seed", nParts = 7)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(p1 === p7)
    assert(p1.map(r => r._1 -> ((r._2, r._3))).toMap === out)
    // a different seed shifts the comb offset (almost surely a different draw set)
    val other = CorpusOps.importanceResample(w, "doc_id", "w", n, "other-seed")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(other.values.sum === n)
    // guard throws must not STRAND the eager prefix checkpoint (the
    // release-on-failure boundary — code-review r17): block count returns
    // to baseline after each intercepted failure
    def blocks() = spark.sparkContext.getRDDStorageInfo.length
    val baseBlocks = blocks()
    // overflow guard is loud with the remedy named
    val big = Seq((1L, Long.MaxValue / 10), (2L, Long.MaxValue / 10)).toDF("doc_id", "w")
    val err = intercept[IllegalArgumentException] {
      CorpusOps.importanceResample(big, "doc_id", "w", 1000L, "s")
    }
    assert(err.getMessage.contains("overflows"), err.getMessage)
    // a NEGATIVE weight runs its interval backwards and would silently
    // break the exactly-n contract (its n_draws can go negative and be
    // filtered) — loud failure, checked in the same totals aggregation
    val neg = Seq((1L, 500L), (2L, -3L), (3L, 100L)).toDF("doc_id", "w")
    val errNeg = intercept[IllegalArgumentException] {
      CorpusOps.importanceResample(neg, "doc_id", "w", 10L, "s")
    }
    assert(errNeg.getMessage.contains("negative weight"), errNeg.getMessage)
    // async unpersist: poll to a deadline (the ScaleMechanicsSpec pattern)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (blocks() > baseBlocks && System.nanoTime() < deadline) Thread.sleep(50)
    assert(blocks() <= baseBlocks,
      s"guard throws stranded checkpoint blocks: ${blocks()} vs baseline $baseBlocks")
  }

  test("topFraction: exact global ranks match a full sort, partition-invariant, tie-break by id, edge fractions") {
    // scores with heavy ties so the id tie-break is load-bearing
    val docs = (0L until 5000L).map(i => (i, (i % 97) * 1000L)).toDF("doc_id", "s")
    val got = CorpusOps.topFraction(docs, "doc_id", "s", keepPpm = 100000L)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    assert(got.size === 500)
    // ground truth: full sort (fixture-sized — the thing topFraction
    // avoids at scale, used here as the oracle)
    val truth = docs.orderBy($"s".desc, $"doc_id".asc).limit(500)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === truth)
    assert(got.map(_._3) === (1L to 500L))
    // partition-count invariance: the distributed rank is exact at any P
    val p1 = CorpusOps.topFraction(docs.repartition(7), "doc_id", "s", 100000L, nParts = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val p9 = CorpusOps.topFraction(docs.repartition(3), "doc_id", "s", 100000L, nParts = 9)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    assert(p1 === got && p9 === got)
    // edges: 0 keeps nothing, 1e6 keeps everything
    assert(CorpusOps.topFraction(docs, "doc_id", "s", 0L).count() === 0L)
    assert(CorpusOps.topFraction(docs, "doc_id", "s", 1000000L).count() === 5000L)
  }

  test("topFractionByGroup: exact per-group cut, no cross-group crowding, floor quota") {
    // group g0 scores high across the board, g1 low: a GLOBAL cut would
    // keep only g0 — the per-group face must keep the best of EACH
    val docs = (0L until 300L).map { i =>
      val g = if (i % 2 == 0) "g0" else "g1"
      (i, g, (if (g == "g0") 1000000L else 1000L) + i)
    }.toDF("doc_id", "g", "s")
    val got = CorpusOps.topFractionByGroup(docs, "doc_id", "g", "s", keepPpm = 100000L)
      .as[(Long, String, Long, Long)].collect()
    val byG = got.groupBy(_._2)
    // exactly floor(150 * 0.1) = 15 per group — no crowding
    assert(byG("g0").length === 15 && byG("g1").length === 15)
    // each group keeps its OWN best, ranks 1..15
    Seq("g0", "g1").foreach { g =>
      val kept = byG(g).sortBy(_._4)
      assert(kept.map(_._4) === (1L to 15L))
      val truth = docs.filter($"g" === g).orderBy($"s".desc, $"doc_id".asc).limit(15)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept.map(_._1).toSeq === truth)
    }
    // quota is a floor: 9 rows at 10% keep nothing
    val tiny = (0L until 9L).map(i => (i, "x", i)).toDF("doc_id", "g", "s")
    assert(CorpusOps.topFractionByGroup(tiny, "doc_id", "g", "s", 100000L).count() === 0L)
  }

  test("corpusMixPlan/applyMixPlan: exact BIGINT wants and rates, loud fits=false, apply respects the plan") {
    val docs = (0L until 400L).map { i =>
      val src = s"s${i % 4}"
      // s0 is token-poor (10/doc), the rest are rich (40/doc)
      (i, src, if (src == "s0") 10L else 40L)
    }.toDF("doc_id", "source", "n_tok")
    // shares: s0 40%, s1 40%, s2 20%; s3 unplanned. budget 4000
    val plan = CorpusOps.corpusMixPlan(
      docs, "source", col("n_tok"),
      Map("s0" -> 400000L, "s1" -> 400000L, "s2" -> 200000L), 4000L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // s0: avail 1000, want 1600 -> fits=false, capped rate 1e6, plan 1000
    assert(plan("s0") === ((1000L, 1600L, 1000L, 1000000L, false)))
    // s1: avail 4000, want 1600 -> rate 400000 exactly
    assert(plan("s1") === ((4000L, 1600L, 1600L, 400000L, true)))
    // s2: avail 4000, want 800 -> rate 200000
    assert(plan("s2") === ((4000L, 800L, 800L, 200000L, true)))
    // s3 unplanned: want 0, rate 0, fits (vacuously)
    assert(plan("s3") === ((4000L, 0L, 0L, 0L, true)))
    val planDf = CorpusOps.corpusMixPlan(
      docs, "source", col("n_tok"),
      Map("s0" -> 400000L, "s1" -> 400000L, "s2" -> 200000L), 4000L)
    val kept = CorpusOps.applyMixPlan(docs, "doc_id", "source", planDf)
      .as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // capped source keeps EVERYTHING; unplanned source keeps NOTHING
    assert(bySrc("s0") === 100)
    assert(!bySrc.contains("s3"))
    // md5 tickets are uniform: s1 keeps ~40 of 100 docs, s2 ~20
    assert(bySrc("s1") > 25 && bySrc("s1") < 55, s"s1 kept ${bySrc("s1")}")
    assert(bySrc("s2") > 10 && bySrc("s2") < 32, s"s2 kept ${bySrc("s2")}")
    // determinism + growth stability (the stratifiedSample contract)
    val grown = (0L until 800L).map { i =>
      val src = s"s${i % 4}"
      (i, src, if (src == "s0") 10L else 40L)
    }.toDF("doc_id", "source", "n_tok")
    val keptGrown = CorpusOps.applyMixPlan(grown, "doc_id", "source", planDf)
      .filter($"doc_id" < 400).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(keptGrown === kept.sortBy(_._1).toSeq)
    // a planned source ABSENT from the corpus still emits a row — want>0,
    // avail=0, rate 0, fits=false (ADVICE r16: groupBy alone would drop it
    // and the shortfall would be silent)
    val planAbsent = CorpusOps.corpusMixPlan(
      docs, "source", col("n_tok"),
      Map("s1" -> 500000L, "missing_src" -> 500000L), 4000L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(planAbsent("missing_src") === ((0L, 2000L, 0L, 0L, false)),
      s"absent planned source row: ${planAbsent.get("missing_src")}")
    // and an absent source with want=0 is vacuously fine
    val planAbsent0 = CorpusOps.corpusMixPlan(
      docs, "source", col("n_tok"),
      Map("s1" -> 1000000L, "missing_src" -> 0L), 4000L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(planAbsent0("missing_src") === true)
  }

  test("curation capstone composes as ONE lazy plan: construction launches no Spark jobs") {
    // parquet LISTING jobs ("parquet at Tables.scala") are read plumbing
    // that spark.read runs per fresh DataFrameReader — only jobs from
    // pipeline stages (a collect, a checkpoint, a flood guard) count
    val eager = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name)
        if (!names.forall(_.startsWith("parquet at"))) eager.add(names.mkString(" | "))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = graft.queries.DataQueries.queries("d_curation_pipeline")(spark, sf)
      Thread.sleep(1000) // listener bus is async
      assert(eager.isEmpty,
        s"capstone construction ran eager stage(s): ${eager.toArray.mkString("; ")}")
      // and the composed gate actually selects: planned sources only
      val rows = df.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getString(1)).toSet.subsetOf(Set("src0", "src1", "src2", "src3")))
      // skinny-shuffle pin (VERDICT r16 #4): no exchange in the whole
      // pipeline may CARRY the text column — the dedup rank moves
      // (md5, doc_id) and the winners ride a broadcast, so corpus text
      // never crosses a shuffle. AQE off for this assertion: the adaptive
      // wrapper hides pre-execution exchanges from plan.collect.
      val aqe = "spark.sql.adaptive.enabled"
      val aqePrev = spark.conf.get(aqe)
      try {
        spark.conf.set(aqe, "false")
        val plan = graft.queries.DataQueries.queries("d_curation_pipeline")(spark, sf)
          .queryExecution.executedPlan
        val exchanges = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exchanges.nonEmpty, "expected shuffles (window + mix aggregation) in the capstone")
        exchanges.foreach { e =>
          assert(!e.output.exists(_.name == "text"),
            s"an exchange carries corpus text:\n$e")
        }
      } finally spark.conf.set(aqe, aqePrev)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("DSIR capstone: lazy after the resample boundary; draws carry into the final mix") {
    // pre-pay the ONE materialization boundary (campaign scoring scan +
    // the resample's prefix-sum checkpoint/collect) ...
    val docs = graft.core.Tables.documents(spark, sf)
    val drawn = CorpusOps.importanceResample(
      graft.queries.DataQueries.dImportanceCampaign(spark, sf)
        .select($"doc_id", $"imp_e6"),
      "doc_id", "imp_e6", n = 200L, seed = "graft-r16")
    // ... then the back half (multiset mixture plan + apply) must compose
    // as ONE lazy tree: zero jobs at construction (the curation precedent)
    val eager = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name)
        if (!names.forall(_.startsWith("parquet at"))) eager.add(names.mkString(" | "))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val df =
      try {
        val composed = graft.queries.DataQueries.dsirAfterResample(docs, drawn)
        Thread.sleep(1000) // listener bus is async
        assert(eager.isEmpty,
          s"post-boundary DSIR construction ran eager stage(s): ${eager.toArray.mkString("; ")}")
        composed
      } finally spark.sparkContext.removeSparkListener(l)
    val rows = df.as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    // only planned sources survive the mix, and every survivor was drawn
    assert(rows.map(_._2).toSet.subsetOf(Set("src0", "src1", "src2", "src3")))
    assert(rows.forall(_._3 >= 1L))
    // every survivor IS a drawn doc (the mix never invents rows) —
    // multiplicity itself is pinned in the importanceResample spec above
    val drawnIds = drawn.select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet.subsetOf(drawnIds))
  }

  test("stratifiedSample: deterministic, rate-respecting, stable under corpus growth") {
    val docs = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    val kept = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates, 0.0)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // md5 tickets are uniform: expect ~250 en (500*0.5), ~150 de (1500*0.1)
    assert(byLang("en") > 200 && byLang("en") < 300, s"en rate off: ${byLang("en")}/500")
    assert(byLang("de") > 110 && byLang("de") < 190, s"de rate off: ${byLang("de")}/1500")
    // deterministic: the same call yields the same set
    val again = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates, 0.0)
    assert(again.select("doc_id").as[Long].collect().sorted ===
      kept.select("doc_id").as[Long].collect().sorted)
    // STABLE sampling: growing the corpus never changes earlier verdicts —
    // what makes incremental corpus rebuilds diff-able
    val grown = (0L until 4000L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("doc_id", "lang")
    val keptGrown = CorpusOps.stratifiedSample(grown, "doc_id", "lang", rates, 0.0)
      .filter($"doc_id" < 2000).select("doc_id").as[Long].collect().sorted
    assert(keptGrown === kept.select("doc_id").as[Long].collect().sorted)
  }

  test("shuffleShards: deterministic per-seed, gapless per-shard positions, seed reshuffles") {
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val s1 = CorpusOps.shuffleShards(docs, "doc_id", "ep0", nShards = 4)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(s1.length === 500)
    // positions are 1..count(shard) with no gaps, per shard
    s1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.length.toLong).toArray)
    }
    // pure function of (seed, id): identical on re-run
    val again = CorpusOps.shuffleShards(docs, "doc_id", "ep0", nShards = 4)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1) === s1.sortBy(_._1))
    // a new seed produces a different order (new epoch)
    val ep1 = CorpusOps.shuffleShards(docs, "doc_id", "ep1", nShards = 4)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(ep1.sortBy(_._1).toSeq !== s1.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](CorpusOps.shuffleShards(docs, "doc_id", "x", 0))
  }

  test("decontaminate: planted 5-gram overlap flagged, clean docs absent") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // contains the bench 5-gram "alpha beta gamma delta epsilon" → hit
      (1L, "xx alpha beta gamma delta epsilon yy"),
      // two distinct overlapping bench 5-grams → 2 hits
      (2L, "alpha beta gamma delta epsilon zeta"),
      // shares words but no full 5-gram → clean
      (3L, "alpha beta gamma delta other epsilon"),
      (4L, "totally unrelated text body here now")
    ).toDF("doc_id", "text")
    val got = graft.data.Decontaminate.hits(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
    // clean face: contaminated docs removed, clean ones untouched
    val cleaned = graft.data.Decontaminate.clean(train, bench, "doc_id", "text", n = 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(cleaned === Set(3L, 4L))
  }

  test("hitsMulti: one scan over N eval sets equals the per-set single runs") {
    // equality holds only over docs with >= n tokens: shorter docs emit one
    // partial shingle on the hashed face and nothing on the string face
    // (documented divergence, pinned in the next test) — filter them out
    // HERE so a fixture regeneration with short docs can't produce a
    // confusing failure in this test
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(size(graft.data.TextAnalysis.tokens($"text")) >= 3)
    val sets = Seq(97, 89, 83)
    val train = docs.filter(sets.map(m => pmod($"doc_id", lit(m)) =!= 0).reduce(_ && _))
    val benches = sets.map(m => s"eval$m" -> docs.filter(pmod($"doc_id", lit(m)) === 0))
    val multi = graft.data.Decontaminate.hitsMulti(train, benches, "doc_id", "text", n = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(multi.nonEmpty, "fixture produced no contamination — test is vacuous")
    assert(multi.map(_._2).size >= 2, "fewer than two eval sets hit — weak fixture")
    val singles = benches.flatMap { case (name, bench) =>
      graft.data.Decontaminate.hits(train, bench, "doc_id", "text", n = 3)
        .as[(Long, Long)].collect().map { case (id, hits) => (id, name, hits) }
    }.toSet
    assert(multi === singles)
  }

  test("hitsMulti vs hits on short docs: hashed face sees partial shingles, string face drops them") {
    // a 2-token doc at n=3: ShingleHash60 emits its one partial shingle, so
    // identical short docs "contaminate" each other on the hashed face; the
    // string-gram face emits no gram at all. This is the documented
    // divergence the >= n filter in the equality test exists for.
    val short2 = "alpha beta"
    val bench = Seq((100L, short2)).toDF("doc_id", "text")
    val train = Seq((1L, short2), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val multi = graft.data.Decontaminate.hitsMulti(train, Seq("e" -> bench), "doc_id", "text", n = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(multi === Set((1L, "e", 1L)), s"hashed face should flag the identical short doc: $multi")
    val single = graft.data.Decontaminate.hits(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toSet
    assert(single === Set.empty, s"string face should drop sub-n docs entirely: $single")
  }

  test("decontaminate campaign face: ModelStore-backed model, output identical to the in-session bloom face") {
    import graft.queries.DataQueries
    val dir = "/root/testdata/sf0.001"
    val inSession = DataQueries.dDecontaminateBloom(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    val campaign = DataQueries.dDecontaminateCampaign(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(inSession.nonEmpty, "fixture produced no contamination — test is vacuous")
    assert(campaign === inSession)
    // the persisted model is on disk and a second run loads it: train must
    // not be re-invoked (bytesOrTrain's by-name train would throw)
    val stamp = graft.connectors.Bucketing.stampDir(s"$dir/documents.parquet")
    val path = s"${graft.data.ModelStore.rootFor(dir)}/bloom-n3-$stamp"
    assert(new java.io.File(path).isFile, s"campaign model not persisted at $path")
    val reloaded = graft.data.ModelStore.bytesOrTrain(path)(sys.error("must not retrain"))
    assert(reloaded.nonEmpty)
  }

  test("decontaminate bloom face: identical output to exact face, bloom probe in the plan") {
    // real-ish corpus so the bloom prunes something: documents at sf0.001
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(pmod($"doc_id", lit(97)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(97)) === 0)
    val exact = graft.data.Decontaminate.hits(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    val bloomed = graft.data.Decontaminate.hitsBloom(train, bench, "doc_id", "text", n = 4)
    val got = bloomed.as[(Long, Long)].collect().sorted.toSeq
    assert(exact.nonEmpty, "fixture produced no contamination — test is vacuous")
    assert(got === exact)
    // the pre-probe is really in the plan, upstream of the exact join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("decontaminate overlap: exact fractions on crafted grams; zero-hit present, sub-n absent") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      // 3 distinct 3-grams, 2 shared with bench -> 2/3
      (1L, "alpha beta gamma delta epsilon"),
      // no shared grams -> present with overlap 0.0, not contaminated
      (2L, "zeta eta theta iota"),
      // fewer than 3 tokens -> no grams, absent
      (3L, "one two"),
      // repeated grams dedup PER DOC: 4 gram positions, 3 distinct, 1 hit
      (4L, "alpha beta gamma alpha beta gamma")
    ).toDF("doc_id", "text")
    val report = graft.data.Decontaminate
      .overlap(train, bench, "doc_id", "text", n = 3, threshold = 0.05)
    // scale shape: the eval grams ride a BROADCAST left join (the corpus
    // side never shuffles for the probe) and the per-doc aggregate is
    // partial/final (map-side combine collapses each doc's grams to one
    // row before the only shuffle)
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan.take(2000))
    val got = report
      .select($"doc_id", $"n_grams", $"n_hits", $"overlap", $"contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L), "sub-n doc must be absent, zero-hit present")
    assert(got(0) === ((1L, 3L, 2L, 2.0 / 3.0, true)))
    assert(got(1) === ((2L, 2L, 0L, 0.0, false)))
    assert(got(2) === ((4L, 3L, 1L, 1.0 / 3.0, true)))
  }

  test("repetitionProfile: exact counts for a crafted doc, empty doc safe") {
    val docs = Seq(
      (1L, "a a a b"), // words=4, distinct=2, top=3, 2grams=3 (a a, a a, a b) distinct=2
      (2L, ""),
      (3L, "x y") // words=2, distinct=2, top=1, 2grams=1 distinct=1
    ).toDF("doc_id", "text")
    val got = graft.data.TextAnalysis.repetitionProfile(docs, "doc_id", "text")
      .select($"doc_id", $"n_words", $"n_distinct_words", $"n_2grams", $"n_distinct_2grams", $"top_word_n")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 4L, 2L, 3L, 2L, 3L)))
    assert(got(1) === ((2L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(2) === ((3L, 2L, 2L, 1L, 1L, 1L)))
  }

  test("chunkDocs: full coverage with overlap, trailing chunk short, empty doc silent") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"), // 3 tokens → one short chunk
      (3L, "") // no chunks
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, "doc_id", "text", chunkTokens = 8, strideTokens = 4)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1 (10 tokens): ceil(max(10-8,0)/4)+1 = 2 chunks at offsets 0,4 —
    // the second reaches the end, so no trailing subset-chunk is emitted
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._4)).toSeq === Seq((0L, 8L), (1L, 6L)))
    assert(got.find(r => r._1 == 1L && r._2 == 1L).get._3 === "w5 w6 w7 w8 w9 w10")
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b c", 3L)))
    assert(!got.exists(_._1 == 3L))
    // every token of doc 1 appears in at least one chunk (coverage)
    val covered = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
    intercept[IllegalArgumentException](CorpusOps.chunkDocs(docs, "doc_id", "text", 4, 8))
  }

  test("property: shuffleShards is a permutation and repetition counts are consistent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def holds(p: Prop): Boolean =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p).passed
    // shuffleShards: (shard,pos) pairs are unique and cover every doc once
    val pShuffle = Prop.forAll(Gen.choose(1L, 300L), Gen.choose(1, 7)) { (nDocs, nShards) =>
      val docs = (0L until nDocs).map(i => Tuple1(i)).toDF("doc_id")
      val rows = CorpusOps.shuffleShards(docs, "doc_id", "s", nShards)
        .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
      rows.length == nDocs &&
        rows.map(r => (r._2, r._3)).distinct.length == nDocs &&
        rows.forall(r => r._2 >= 0 && r._2 < nShards)
    }
    assert(holds(pShuffle))
    // repetitionProfile invariants on random word soups
    val wordGen = Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    val pRep = Prop.forAll(Gen.listOfN(5, wordGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      graft.data.TextAnalysis.repetitionProfile(docs, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .forall { case (_, nw, ndw, n2, nd2, top) =>
          ndw <= nw && nd2 <= n2 && top <= nw &&
            (nw == 0 || (top >= (nw + ndw - 1) / ndw && top >= 1))
        }
    }
    assert(holds(pRep))
  }

  test("bigramCommonness: exact corpus-frequency scores, short docs zeroed, external train set") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c d"), (3L, "x")).toDF("doc_id", "text")
    // corpus bigram counts: "a b"->3 (doc1 twice, doc2 once), "b a"->1, "b c"->1, "c d"->1
    val got = graft.data.TextAnalysis.bigramCommonness(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 3L, 7L, 1L))) // grams (a b, b a, a b) → 3+1+3
    assert(got(1) === ((2L, 3L, 5L, 1L))) // grams (a b, b c, c d) → 3+1+1
    assert(got(2) === ((3L, 0L, 0L, 0L))) // single token: no bigrams
    // external train set: unseen grams score 0 (the "never seen in the
    // reference corpus" signal)
    val train = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val ext = graft.data.TextAnalysis.bigramCommonness(docs, "doc_id", "text", Some(train))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(ext(1) === ((2L, 3L, 2L, 0L))) // only "a b" (count 2 in train) known
  }

  test("selectByTokenBudget: matches brute-force greedy prefix on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def holds(p: Prop): Boolean =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p).passed
    // negative scores included: banding uses floor-division, which differs
    // from truncation exactly there (floor(-7/2) = -4, not -3)
    val docGen = Gen.listOfN(60, Gen.zip(Gen.choose(-999L, 999L), Gen.choose(1L, 50L)))
    val p = Prop.forAll(docGen, Gen.choose(0L, 2000L), Gen.choose(1L, 200L)) {
      (docs, budget, bandWidth) =>
        val rows = docs.zipWithIndex.map { case ((score, tok), i) => (i.toLong, score, tok) }
        val df = rows.toDF("doc_id", "score_in", "tok_in")
        // full rows, not just ids: duplicate emission or mislabeled
        // score/n_tokens columns must fail the property
        val got = CorpusOps
          .selectByTokenBudget(df, "doc_id", $"score_in", $"tok_in", budget, bandWidth)
          .select($"doc_id", $"score", $"n_tokens")
          .as[(Long, Long, Long)].collect().sorted.toSeq
        // brute-force greedy prefix over (score desc, id asc)
        var cum = 0L
        val want = rows.sortBy(r => (-r._2, r._1)).takeWhile { r =>
          cum += r._3; cum <= budget
        }.map(r => (r._1, r._2, r._3)).sorted
        got === want
    }
    assert(holds(p))
  }

  test("packSequences: offsets stay inside the budget, sequences fill contiguously per shard") {
    val docs = (0L until 300L).map(i => (i, s"doc $i", (i % 97 + 1).toInt)).toDF("doc_id", "text", "n")
    val packed = CorpusOps.packSequences(docs, "doc_id", $"n", budget = 100, nShards = 4)
      .collect()
    assert(packed.length === 300)
    packed.foreach { r =>
      val off = r.getAs[Long]("seq_offset")
      assert(off >= 0 && off < 100, s"offset $off outside budget")
      assert(r.getAs[Long]("shard") === r.getAs[Long]("doc_id") % 4)
    }
    // per shard: cumulative layout is gapless — each doc starts exactly where
    // the running token total left off
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert((r.getAs[Long]("seq_id") & ((1L << 44) - 1)) === cum / 100)
        assert(r.getAs[Long]("seq_id") >> 44 === r.getAs[Long]("shard"))
        assert(r.getAs[Long]("seq_offset") === cum % 100)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("assignSplits: exhaustive+disjoint labels, rate-respecting, stable under growth, seed redraws") {
    val docs = (0L until 4000L).map(i => Tuple1(i)).toDF("doc_id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = CorpusOps.assignSplits(docs, "doc_id", splits, "s1")
    val byLabel = got.groupBy("split").count().as[(String, Long)].collect().toMap
    // every row gets exactly one label; fractions hold within tolerance
    assert(byLabel.values.sum === 4000L)
    assert(byLabel("train") > 3450 && byLabel("train") < 3750, s"train off: $byLabel")
    assert(byLabel("val") > 120 && byLabel("val") < 280, s"val off: $byLabel")
    assert(byLabel("test") > 120 && byLabel("test") < 280, s"test off: $byLabel")
    // stability: the first 2000 docs keep their labels when the corpus doubles
    val half = CorpusOpsSpecHelpers.labels(
      CorpusOps.assignSplits(docs.filter($"doc_id" < 2000), "doc_id", splits, "s1"))
    val full = CorpusOpsSpecHelpers.labels(got.filter($"doc_id" < 2000))
    assert(half === full, "labels migrated when the corpus grew")
    // a different seed actually redraws
    val redrawn = CorpusOpsSpecHelpers.labels(
      CorpusOps.assignSplits(docs, "doc_id", splits, "s2"))
    assert(redrawn !== CorpusOpsSpecHelpers.labels(got))
    // bad fractions rejected
    val e = intercept[IllegalArgumentException] {
      CorpusOps.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4), "s1")
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("stripBoilerplate: shared chunks removed everywhere, unique text survives in order") {
    // 2-token chunks; "nav bar" opens docs 1-3 (boilerplate), "cookie notice"
    // closes docs 1-2 (boilerplate), middles are unique
    val docs = Seq(
      (1L, "nav bar alpha one cookie notice"),
      (2L, "nav bar beta two cookie notice"),
      (3L, "nav bar gamma three"),
      (4L, "delta four echo five"), // untouched
      (5L, "") // empty doc
    ).toDF("doc_id", "text")
    val got = CorpusOps.stripBoilerplate(docs, "doc_id", "text", chunkTokens = 2, minDocs = 2)
      .select($"doc_id", $"n_chunks", $"n_removed", $"cleaned")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 3L, 2L, "alpha one")))
    assert(got(1) === ((2L, 3L, 2L, "beta two")))
    assert(got(2) === ((3L, 2L, 1L, "gamma three")))
    assert(got(3) === ((4L, 2L, 0L, "delta four echo five")))
    assert(got(4) === ((5L, 0L, 0L, "")))
  }

  test("stripBoilerplate: within-doc repeats don't count toward the distinct-doc threshold") {
    val docs = Seq(
      (1L, "spam spam spam spam unique tail"), // "spam spam" twice in ONE doc
      (2L, "other words here now")
    ).toDF("doc_id", "text")
    val got = CorpusOps.stripBoilerplate(docs, "doc_id", "text", chunkTokens = 2, minDocs = 2)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
    // an all-boilerplate doc rebuilds to empty, not null
    val all = Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text")
    val cleaned = CorpusOps.stripBoilerplate(all, "doc_id", "text", 2, 2)
      .select($"cleaned").as[String].collect()
    assert(cleaned === Array("", ""))
  }
}
