package graft

import org.apache.spark.sql.functions._
import graft.data.SnapshotOps

class SnapshotOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: classifies added/removed/changed/unchanged; 1:1 on ids") {
    val prev = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie old"), (4L, "delta")
    ).toDF("doc_id", "text")
    val curr = Seq(
      (1L, "alpha"), (3L, "charlie new"), (4L, "delta"), (5L, "echo")
    ).toDF("doc_id", "text")
    val got = SnapshotOps.snapshotDiff(prev, curr, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
    // one output row per id — the join never fans out
    assert(got.size === 5)
  }

  test("snapshotDiff: identical snapshots are all-unchanged; empty prev is all-added") {
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val same = SnapshotOps.snapshotDiff(docs, docs, "doc_id", "text")
    assert(same.filter($"status" =!= "unchanged").count() === 0)
    val empty = docs.filter(lit(false))
    val allAdded = SnapshotOps.snapshotDiff(empty, docs, "doc_id", "text")
    assert(allAdded.filter($"status" =!= "added").count() === 0)
    assert(allAdded.count() === 50)
  }

  test("incrementalDedup: corpus hit beats within-delta dup; keeper is lowest id") {
    val corpus = Seq((100L, "ingested"), (101L, "other")).toDF("doc_id", "text")
    val delta = Seq(
      (1L, "ingested"),  // dup_corpus — even though id 1 is the batch minimum
      (2L, "fresh"),     // new (keeper of the fresh group)
      (3L, "fresh"),     // dup_delta
      (4L, "alone")      // new
    ).toDF("doc_id", "text")
    val got = SnapshotOps.incrementalDedup(corpus, delta, "doc_id", "text")
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "dup_corpus", 2L -> "new", 3L -> "dup_delta", 4L -> "new"))
  }

  test("incrementalDedupByHash: duplicate hashes in the manifest don't fan the delta out") {
    val manifest = Seq("a", "a", "b").toDF("h")
      .select(md5($"h").as("content_hash"))
    val delta = Seq((1L, "a"), (2L, "c")).toDF("doc_id", "text")
    val got = SnapshotOps.incrementalDedupByHash(manifest, delta, "doc_id", "text")
    assert(got.count() === 2)
    assert(got.filter($"doc_id" === 1 && $"verdict" === "dup_corpus").count() === 1)
    assert(got.filter($"doc_id" === 2 && $"verdict" === "new").count() === 1)
  }
}
