package graft

import org.apache.spark.sql.functions._
import graft.data.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

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
}
