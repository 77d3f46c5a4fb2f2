package graft.data

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Persistence for the corpus-trained ANN models (coarse-quantizer
  * centroids, PQ codebooks) — the cross-JVM face of the in-session memo in
  * `queries/DataQueries`.
  *
  * A production campaign trains its quantizer ONCE per corpus snapshot and
  * ships the model to every indexing / search / semdedup job that follows;
  * retraining per job would both waste the training scans and silently
  * version-skew the bucket assignments between writer and reader. Models
  * are tiny driver values (k·dim doubles), stored as parquet so the
  * round-trip is IEEE-exact: parquet DOUBLE is the same 8-byte IEEE-754
  * value — a reloaded model reproduces bucket assignments and ADC scores
  * bit-for-bit (pinned in SimilaritySpec).
  *
  * ==Retention / eviction==
  * Model names embed a source-content stamp, so every corpus regeneration
  * STRANDS the previous stamp's models under the (stable) per-corpus root
  * — they are never re-read, only accumulated. Operators should either
  * call [[evictStale]] with the live stamp after retraining (what the
  * query layer does), or clear `/tmp/graft-models-*` out-of-band — the
  * store is a cache, and deleting a live model only costs one retrain.
  */
object ModelStore {

  /** Delete stamped models under `rootFor(dir)` whose name does NOT end in
    * any of the `liveStamps` — the previous-generation models a corpus
    * regeneration strands. `liveStamps` is a SET because one corpus root
    * holds models stamped from different source tables (embeddings-derived
    * quantizers, documents-derived blooms). Returns the number of entries
    * removed. Safe against concurrent readers of a live stamp (only other
    * stamps are touched); a reader of a stale stamp retrains, which is the
    * cache contract.
    */
  def evictStale(dir: String, liveStamps: Set[String]): Int = {
    val root = new java.io.File(rootFor(dir))
    val stale = Option(root.listFiles()).getOrElse(Array.empty)
      .filterNot(f => liveStamps.exists(s => f.getName.endsWith(s"-$s")))
      // never touch in-flight write artifacts: a concurrent writer's
      // parquet stage (`<model>.stage-<pid>`) or saveBytes temp
      // (`.model*.tmp`) is seconds from committing under the LIVE stamp
      .filterNot(f => f.getName.contains(".stage-") || f.getName.endsWith(".tmp"))
    stale.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    stale.length
  }

  /** Per-corpus store root. One directory per corpus dir; callers append a
    * model name that embeds the training params AND a source-content stamp
    * ([[graft.connectors.Bucketing.stampDir]]) so a regenerated corpus can
    * never silently reuse a stale model — the same invalidation contract
    * the bucketed-layout cache uses.
    *
    * Keyed on a sanitized basename plus an MD5 digest of the NORMALIZED
    * absolute path — NOT `hashCode`: 32-bit collisions would let two
    * distinct corpus dirs silently share a model root (and
    * `math.abs(Int.MinValue)` is still negative). MD5-of-path makes
    * cross-dir collision practically impossible; the basename keeps the
    * root human-debuggable. Normalizing first ('/data/corpus' ≡
    * '/data/corpus/' ≡ a relative spelling of the same dir) stops jobs
    * that spell one corpus differently from silently retraining and
    * version-skewing bucket assignments — the exact hazard this keying
    * exists to prevent.
    */
  def rootFor(dir: String): String = {
    // un-normalizable spellings (e.g. an embedded NUL) fall back to the raw
    // string — they can't name a real corpus dir, so the only contract that
    // matters for them is stability + non-collision, which the digest keeps
    val norm =
      try new java.io.File(dir).getAbsoluteFile.toPath.normalize.toString
      catch { case _: java.nio.file.InvalidPathException => dir }
    val base = new java.io.File(norm).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    s"/tmp/graft-models-$base-$md5"
  }

  private def done(path: String): Boolean =
    new java.io.File(path, "_SUCCESS").exists()

  /** Load the centroids at `path` if a completed save exists there,
    * otherwise train (by-name), persist, and return them. The reloaded
    * values are the exact IEEE doubles that were saved (SimilaritySpec), so
    * first-run and every-later-run callers compute identical plans.
    *
    * The load is race-hardened against [[evictStale]]: a concurrent JVM
    * still resolving models under an older corpus stamp can pass `done()`
    * and then lose the directory to another JVM's eviction mid-read. That
    * reader falls through to retrain-and-persist (the cache contract:
    * deleting a live model only ever costs one retrain) instead of
    * surfacing a missing-file read failure — pinned by PropertiesSpec's
    * evict-under-reader test.
    */
  def centroidsOrTrain(spark: SparkSession, path: String)(
      train: => Seq[Seq[Double]]): Seq[Seq[Double]] =
    orTrain(path)(loadCentroids(spark, path), saveCentroids(spark, path, _), train)

  /** [[centroidsOrTrain]] for PQ codebooks — same evict-race fallback. */
  def codebooksOrTrain(spark: SparkSession, path: String)(
      train: => Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] =
    orTrain(path)(loadCodebooks(spark, path), saveCodebooks(spark, path, _), train)

  /** The single recovery flow behind both typed loaders: marker check →
    * load → evict-race classification → torn-marker clear → retrain-and-
    * persist. One site, so a change to the race handling can never leave
    * the centroid and codebook paths with divergent crash-recovery
    * semantics (r12 review finding).
    */
  private def orTrain[M](path: String)(load: => M, save: M => Unit, train: => M): M = {
    val hadMarker = done(path)
    val loaded =
      if (hadMarker)
        try Some(load)
        catch { case e: Exception if evictedUnderneath(path, e) => None }
      else None
    loaded.getOrElse {
      val m = train
      if (hadMarker) clearTorn(path)
      save(m); m
    }
  }

  /** After a load-despite-marker failure, a lingering `_SUCCESS` (the tail
    * of a mid-flight evict that removed the data files first) would make
    * the retrain's staged save a silent no-op — writeStaged early-returns
    * on `done`. Clear the torn directory so the retrained model actually
    * re-persists. Called ONLY on that load-failure path (`hadMarker`):
    * in the plain first-train path a `done` directory appearing between
    * the initial check and the save is a concurrent writer's GOOD model,
    * and writeStaged's first-writer-wins early-return must keep it —
    * deleting there would let a crash between delete and re-save strand
    * the store with no model at all (r12 review finding). On the
    * load-failure path the worst case of the same interleaving is one
    * extra retrain, the cache contract.
    */
  private def clearTorn(path: String): Unit =
    if (done(path)) org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))

  /** True iff a load failure is the concurrent-eviction race (the model
    * directory vanished — wholly or file-by-file — between `done()` and
    * the parquet read) rather than a genuine data error: retraining is the
    * correct recovery for a vanished cache entry. Two observable shapes:
    * the directory is already gone when we re-check (`!done`), or the
    * recursive delete is mid-flight and the read died on missing
    * files/paths while `_SUCCESS` still lingers (deleteQuietly removes
    * children in listing order, so a reader can catch the store with data
    * files gone and the marker not yet). A corrupt-but-PRESENT model
    * (parquet decode failure on files that exist) still rethrows —
    * silently retraining over real corruption would mask it.
    */
  private def evictedUnderneath(path: String, e: Exception): Boolean =
    !done(path) || missingUnderneath(e)

  @annotation.tailrec
  private def missingUnderneath(t: Throwable): Boolean = t match {
    case null => false
    case _: java.io.FileNotFoundException => true
    case _: java.nio.file.NoSuchFileException => true
    case ae: org.apache.spark.sql.AnalysisException
        if Option(ae.getCondition).exists(c =>
          c.contains("PATH_NOT_FOUND") || c.contains("UNABLE_TO_INFER_SCHEMA")) =>
      true
    case other => missingUnderneath(other.getCause)
  }

  /** Opaque byte-array models (e.g. a serialized campaign bloom filter):
    * written to a temp file then atomically moved, so a concurrent reader
    * never sees a torn model.
    */
  def saveBytes(path: String, bytes: Array[Byte]): Unit = {
    val target = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(target.getParent)
    val tmp = java.nio.file.Files.createTempFile(target.getParent, ".model", ".tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(
      tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Load the byte model at `path`, or train-and-persist on first use. */
  def bytesOrTrain(path: String)(train: => Array[Byte]): Array[Byte] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readAllBytes(p)
    else { val m = train; saveBytes(path, m); m }
  }

  private val centroidSchema = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Stage-then-rename parquet write (the JobFixtures.cached pattern, with
    * a (pid, counter)-unique stage so two concurrent trainers never
    * interleave into one directory — the pid alone distinguishes JVMs but
    * NOT two threads of one JVM, which PropertiesSpec's racing-writers
    * test caught blending both models into a single stage): the first
    * rename wins, the loser's stage is discarded — a reader at `path`
    * only ever sees a complete model.
    */
  private val stageCounter = new java.util.concurrent.atomic.AtomicLong()
  private def writeStaged(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val dst = new java.io.File(path)
    if (done(path)) return
    // a dst without _SUCCESS is a torn write (crash before commit): remove
    // it rather than letting it block the rename forever — otherwise every
    // future JVM retrains, discards its stage, and persistence is silently
    // dead
    if (dst.exists()) org.apache.commons.io.FileUtils.deleteQuietly(dst)
    val stage = new java.io.File(
      s"$path.stage-${ProcessHandle.current().pid()}-${stageCounter.incrementAndGet()}")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      if (dst.exists() || !stage.renameTo(dst)) {
        // renameTo returning false is ambiguous: "concurrent writer won" and
        // "rename failed" (cross-filesystem move, OS quirk) look identical.
        // If no completed model actually exists at dst, a silent discard
        // here would kill persistence forever (every future JVM retrains and
        // loses the race against nobody) — so verify, then fall back to
        // Files.move, which THROWS on failure instead of lying.
        if (!done(path))
          try java.nio.file.Files.move(stage.toPath, dst.toPath)
          catch {
            // lost a race INSIDE the fallback window: a concurrent writer
            // committed dst between the done() re-check and the move. That
            // is the benign first-writer-wins outcome, not a failure — only
            // rethrow if dst still lacks a completed model.
            case e: java.nio.file.FileAlreadyExistsException =>
              if (!done(path)) throw e
          }
        else // concurrent writer won — first writer wins, discard our stage
          org.apache.commons.io.FileUtils.deleteQuietly(stage)
      }
    } finally
      if (stage.exists()) org.apache.commons.io.FileUtils.deleteQuietly(stage)
  }

  /** Persist coarse-quantizer centroids; `centroids(i)` is bucket i. */
  def saveCentroids(spark: SparkSession, path: String, centroids: Seq[Seq[Double]]): Unit = {
    val rows = centroids.zipWithIndex.map { case (c, i) => Row(i, c) }
    writeStaged(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), centroidSchema), path)
  }

  /** Reload centroids in bucket order — the exact doubles that were saved. */
  def loadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(path)
      .collect()
      .sortBy(_.getAs[Int]("bucket"))
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq)
      .toSeq

  private val codebookSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("center", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Persist PQ codebooks; `codebooks(m)(c)` is subspace m's code-c center. */
  def saveCodebooks(spark: SparkSession, path: String, codebooks: Seq[Seq[Seq[Double]]]): Unit = {
    val rows = for {
      (sub, m) <- codebooks.zipWithIndex
      (center, c) <- sub.zipWithIndex
    } yield Row(m, c, center)
    writeStaged(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), codebookSchema), path)
  }

  /** Reload codebooks in (subspace, code) order. */
  def loadCodebooks(spark: SparkSession, path: String): Seq[Seq[Seq[Double]]] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.getAs[Int]("subspace"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Double]]("center").toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }
}
