package graft.stateful

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._
import graft.model.{ChangelogEvent, StreamEnvelop}

/** Spark-4-native stateful operators on `transformWithState`
  * (`StatefulProcessor` + per-key state with built-in TTL + timers) — the
  * direct replacement for Flink's `KeyedProcessFunction` + `StateTtlConfig`
  * the reference uses (SURVEY §4.2). These are the production streaming faces
  * of the same operators whose flatMapGroupsWithState fallbacks live in
  * Deduplicator/Materializer/FlowDisruptionDetector (the fallback exists
  * because transformWithState requires the RocksDB state store).
  *
  * Use with:
  * {{{
  * spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  *   "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  * }}}
  */
object Processors {

  /** Epoch MICROS of a Timestamp — `getTime` alone truncates to millis,
    * which would collapse distinct same-millisecond events and diverge from
    * the batch faces' microsecond columns (fixtures carry true micros).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def ttlConfig(ttlMs: Long): TTLConfig =
    if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE

  /** Streaming near-dup candidate detection, keyed by LSH band bucket:
    * the first doc to claim a bucket owns it (ValueState[Long]); every
    * later doc hitting the bucket emits a [[graft.model.NearDupHit]]
    * pointing at the owner. Within one micro-batch, rows sort by sid so
    * the lowest id deterministically becomes the owner. Re-processing the
    * owner itself is silent (idempotent replay). State is one long per
    * live bucket, TTL-bounded.
    */
  class NearDupProcessor(ttlMs: Long)
      extends StatefulProcessor[String, graft.model.BandRow, graft.model.NearDupHit] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, ttlConfig(ttlMs))

    override def handleInputRows(
        key: String,
        rows: Iterator[graft.model.BandRow],
        timerValues: TimerValues
    ): Iterator[graft.model.NearDupHit] = {
      val sorted = rows.toVector.sortBy(_.sid)
      val out = Vector.newBuilder[graft.model.NearDupHit]
      var own: Option[Long] = if (owner.exists()) Some(owner.get()) else None
      sorted.foreach { r =>
        own match {
          case None =>
            owner.update(r.sid); own = Some(r.sid)
          case Some(o) if o != r.sid =>
            out += graft.model.NearDupHit(r.sid, o)
          case _ => ()
        }
      }
      out.result().iterator
    }
  }

  def nearDupBands(
      ds: Dataset[graft.model.BandRow],
      ttlMs: Long
  ): Dataset[graft.model.NearDupHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.bucket)
      .transformWithState(
        new NearDupProcessor(ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming heavy hitters per group (Misra-Gries summary in MapState):
    * the "domain flood / trending token" monitor of a crawl-ingest
    * pipeline. State per group is AT MOST k counters no matter how many
    * distinct items flow through — the property that makes the gate viable
    * on an unbounded stream — and every reported `estimate` obeys
    * `true - groupTotal/k <= estimate <= true`, so any item with true
    * frequency above groupTotal/k is guaranteed present in the summary.
    *
    * Each micro-batch emits the group's full updated summary (append mode:
    * monitoring reads the rows with the highest `groupTotal` per group).
    * Within a batch, rows fold in item order so replays are deterministic
    * under any partitioning (MG estimates are order-sensitive; pinning the
    * fold order pins the output). The decrement step costs O(k) — the
    * classic MG trade for bounded memory.
    */
  class HeavyHittersProcessor(k: Int, ttlMs: Long)
      extends StatefulProcessor[String, graft.model.ItemObservation, graft.model.HeavyHitter] {
    require(k >= 1, s"heavyHitters: k must be >= 1, got $k")
    @transient private var counters: MapState[String, Long] = _

    /** Item keys are stored under an "i" prefix and the total under bare
      * "t", so NO input string can collide with the reserved entry — a
      * crash-on-collision require would turn a valid data row into a
      * checkpoint-replayed poison pill.
      *
      * The group total lives as a RESERVED key in the SAME MapState as the
      * counters (not a sibling ValueState): every batch clears and rewrites
      * the whole map, so all entries — counters and total — carry the same
      * TTL deadline and expire atomically. Split across two states, a TTL
      * firing between their expiries could leave a surviving total over
      * reset counters (or vice versa), silently voiding the MG bound
      * `true - groupTotal/k <= estimate`.
      */
    private val TotalKey = "t"

    /** Explicit layout-version marker, rewritten with every batch. The
      * key-shape guard below is only probabilistic against the pre-r9
      * UNPREFIXED layout: an old item literally named "iphone" parses as a
      * new-layout entry (mangled to "phone"), and an old item "t" reads as
      * the group total. Requiring this marker on every non-empty restore
      * turns those silent corruptions into the same fail-fast the shape
      * guard gives (ADVICE r10).
      */
    private val VersionKey = "v"
    private val LayoutVersion = 2L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, ttlConfig(ttlMs))

    override def handleInputRows(
        key: String,
        rows: Iterator[graft.model.ItemObservation],
        timerValues: TimerValues
    ): Iterator[graft.model.HeavyHitter] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      var sawVersion = false
      var sawAny = false
      counters.iterator().foreach { e =>
        sawAny = true
        e match {
          case (VersionKey, ver) =>
            if (ver != LayoutVersion)
              throw new IllegalStateException(
                s"heavyHitters: state layout version $ver != $LayoutVersion — " +
                  "this checkpoint was written by an incompatible state " +
                  "layout; restart the query from a fresh checkpoint location")
            sawVersion = true
          case (TotalKey, c) => n = c
          case (ki, c) if ki.startsWith("i") => m(ki.drop(1)) = c
          case (ki, _) =>
            // Shape guard: the pre-r9 layout stored item keys UNPREFIXED
            // (total in a sibling "total" ValueState). Restoring such a
            // checkpoint under this layout would silently mangle every
            // counter key via drop(1) and read an item named "t" as the
            // group total — fail fast instead; the layout change is
            // checkpoint-incompatible and needs a fresh checkpoint.
            throw new IllegalStateException(
              s"heavyHitters: state entry '$ki' is not 'i'-prefixed — this " +
                "checkpoint was written by an older, incompatible state " +
                "layout; restart the query from a fresh checkpoint location")
        }
      }
      if (sawAny && !sawVersion)
        // non-empty state without the marker: every entry happened to parse
        // under the new shape, but the writer predates the marker — the
        // probabilistic hole the marker exists to close; fail fast.
        throw new IllegalStateException(
          "heavyHitters: restored state lacks the layout-version marker — " +
            "this checkpoint was written by an older, incompatible state " +
            "layout; restart the query from a fresh checkpoint location")
      rows.toVector.sortBy(_.item).foreach { r =>
        n += 1
        m.get(r.item) match {
          case Some(c) => m(r.item) = c + 1
          case None if m.size < k => m(r.item) = 1L
          case None =>
            m.keysIterator.toVector.foreach { ki =>
              val c = m(ki) - 1
              if (c == 0) m.remove(ki) else m(ki) = c
            }
        }
      }
      counters.clear()
      counters.updateValue(VersionKey, LayoutVersion)
      counters.updateValue(TotalKey, n)
      m.foreach { case (i, c) => counters.updateValue("i" + i, c) }
      m.toVector
        .sortBy { case (i, c) => (-c, i) }
        .map { case (i, c) => graft.model.HeavyHitter(key, i, c, n) }
        .iterator
    }
  }

  /** [[HeavyHittersProcessor]] wired to a stream of observations. */
  def heavyHitters(
      ds: Dataset[graft.model.ItemObservation],
      k: Int,
      ttlMs: Long = 0L
  ): Dataset[graft.model.HeavyHitter] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.group)
      .transformWithState(
        new HeavyHittersProcessor(k, ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** The deterministic BATCH replay of [[heavyHitters]] — one logical
    * micro-batch holding the whole frame, empty prior state: exactly the
    * rows the streaming processor would emit for that batch
    * (spec-pinned equality in ProcessorsSpec, oracle-replayed by a
    * recursive-CTE MG fold in DuckDB). This is what gives the
    * streaming-only gate a three-check oracle row.
    *
    * The fold is the processor's — rows sorted ascending by item string —
    * with one algebraic collapse that changes nothing: a sorted batch
    * arrives as RUNS of identical items, and a run of c arrivals folds in
    * closed form (present: +c; absent with a free slot: insert c; absent
    * and full with min counter m: if c ≤ m every counter drops by c,
    * zeros evicted; if c > m the m-th arrival frees the min slots, the
    * next inserts, the rest increment → counters drop by m, item enters
    * at c − m).
    *
    * Scale shape: one (group,item) count aggregation (map-side combined),
    * then a secondary-sorted per-group fold (`flatMapSortedGroups`) that
    * streams runs through O(k) state — no group ever materializes in
    * memory, so a group with 10⁹ distinct items costs k counters, same
    * as the streaming state bound.
    */
  def heavyHittersBatch(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int
  ): Dataset[graft.model.HeavyHitter] = {
    require(k >= 1, s"heavyHittersBatch: k must be >= 1, got $k")
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    df.select(col(groupCol).cast("string").as("grp"), col(itemCol).cast("string").as("item"))
      .groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("item")) { (g, it) =>
        val (summary, n) = mgFoldRuns(it.map { case (_, item, c) => (item, c) }, k)
        summary.map { case (i, c) => graft.model.HeavyHitter(g, i, c, n) }.iterator
      }
  }

  /** The run-length-collapsed MG fold of [[heavyHittersBatch]], exposed so
    * PropertiesSpec can pin the closed form against the arrival-by-arrival
    * reference across random feeds. `runs` must arrive item-ASCENDING
    * (the batch-sorted order the streaming processor folds in). Returns
    * (summary sorted by (-estimate, item), total arrivals).
    */
  private[graft] def mgFoldRuns(
      runs: Iterator[(String, Long)],
      k: Int
  ): (Vector[(String, Long)], Long) = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    runs.foreach { case (item, c) =>
      n += c
      m.get(item) match {
        case Some(cur) => m(item) = cur + c
        case None if m.size < k => m(item) = c
        case None =>
          // a run of c arrivals of an absent item against a full summary:
          // the first min(c, mmin) arrivals each decrement every counter;
          // at the mmin-th the minimum entries evict and free a slot, the
          // next arrival inserts, the remaining increment — so counters
          // drop by min(c, mmin) and the item enters at c − mmin iff
          // c > mmin (exactly the arrival-by-arrival fold, collapsed)
          val mmin = m.valuesIterator.min
          val drop = math.min(c, mmin)
          m.keysIterator.toVector.foreach { ki =>
            val nc = m(ki) - drop
            if (nc == 0) m.remove(ki) else m(ki) = nc
          }
          if (c > mmin) m(item) = c - mmin
      }
    }
    (m.toVector.sortBy { case (i, c) => (-c, i) }, n)
  }

  /** Streaming per-source QUALITY GATE against the running score
    * distribution — the streaming face of the corpus top-fraction cut
    * (VERDICT r16 #6): [[graft.data.CorpusOps.topFraction]] needs the whole
    * corpus before it can rank; an ingest pipeline must verdict each
    * arrival NOW. The gate keeps a doc iff it would rank within the top
    * `keepPpm`/1e6 of everything its source has streamed so far:
    *
    *   keep ⇔ nBetter < max(1, (nPrev + 1) · keepPpm div 1e6)
    *
    * where nBetter counts previously-seen docs in strictly HIGHER score
    * bins. State per source is a fixed `nBins`-bin histogram + count —
    * bounded on an unbounded stream, the MG-summary property (a GK sketch
    * bounds rank error tighter per byte, but the binned rule is EXACT on
    * its own bin grain, which is what makes the face oracle-replayable in
    * SQL — the integer tree and the bin function replay bit-for-bit).
    * The quota floor of 1 admits each source's first arrival (cold start:
    * nothing to rank against yet, so the gate trusts it). Bins:
    * `min((max(score − binLo, 0)) div binWidth, nBins−1)` — the clamp
    * keeps both operands non-negative so truncating and floor division
    * agree across engines. Rows fold in sid order within a batch (the
    * NearDupProcessor rule), so replays are deterministic under any
    * partitioning, and the sequential fold makes multi-batch streaming ≡
    * one fold over the concatenated arrivals (spec-pinned).
    */
  class QualityGateProcessor(
      keepPpm: Long, binLo: Long, binWidth: Long, nBins: Int, ttlMs: Long)
      extends StatefulProcessor[String, graft.model.ScoredDoc, graft.model.QualityVerdict] {
    @transient private var st: ValueState[graft.model.QualityGateState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[graft.model.QualityGateState](
        "hist", Encoders.product[graft.model.QualityGateState], ttlConfig(ttlMs))

    override def handleInputRows(
        key: String,
        rows: Iterator[graft.model.ScoredDoc],
        timerValues: TimerValues
    ): Iterator[graft.model.QualityVerdict] = {
      val cur =
        if (st.exists()) st.get()
        else graft.model.QualityGateState(new Array[Long](nBins), 0L)
      val bins = cur.bins.clone() // never mutate a state-store-owned array
      var n = cur.n
      val out = rows.toVector.sortBy(_.sid).map { r =>
        val v = qualityFoldOne(bins, n, r.sid, key, r.score, keepPpm, binLo, binWidth)
        n += 1
        v
      }
      st.update(graft.model.QualityGateState(bins, n))
      out.iterator
    }
  }

  def qualityGate(
      ds: Dataset[graft.model.ScoredDoc],
      keepPpm: Long,
      binLo: Long,
      binWidth: Long,
      nBins: Int,
      ttlMs: Long = 0L
  ): Dataset[graft.model.QualityVerdict] = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, s"qualityGate: keepPpm=$keepPpm outside [0, 1e6]")
    require(binWidth > 0 && nBins > 0, s"qualityGate: need positive binWidth/nBins")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.source)
      .transformWithState(
        new QualityGateProcessor(keepPpm, binLo, binWidth, nBins, ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** The deterministic BATCH replay of [[qualityGate]] — one logical
    * micro-batch holding the whole frame, empty prior state (the
    * [[heavyHittersBatch]] / nearDupGateBatch rule): exactly the verdicts
    * the streaming gate emits for that batch, which is what gives the
    * streaming-only operator a three-check oracle row (`d_quality_gate`).
    *
    * Scale shape: ONE exchange on the source key, then a sid-sorted
    * per-source fold through O(nBins) state via `flatMapSortedGroups` —
    * the group streams, never materializes, so a source with 10⁹ docs
    * costs nBins longs, the same bound as the streaming state. The
    * imperative fold is the operator: arrival i's verdict depends on the
    * folded histogram of arrivals < i, which no window expression can
    * carry without materializing a per-row histogram. High-cardinality
    * grouping contract (sources/domains), like [[graft.data.CorpusOps.topFractionByGroup]].
    */
  def qualityGateBatch(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      srcCol: String,
      scoreCol: String,
      keepPpm: Long,
      binLo: Long,
      binWidth: Long,
      nBins: Int
  ): Dataset[graft.model.QualityVerdict] = {
    require(keepPpm >= 0 && keepPpm <= 1000000L,
      s"qualityGateBatch: keepPpm=$keepPpm outside [0, 1e6]")
    require(binWidth > 0 && nBins > 0, s"qualityGateBatch: need positive binWidth/nBins")
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    df.select(
        col(srcCol).cast("string").as("source"),
        col(idCol).cast("long").as("sid"),
        col(scoreCol).cast("long").as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("sid")) { (src, it) =>
        val bins = new Array[Long](nBins)
        var n = 0L
        it.map { case (_, sid, score) =>
          val v = qualityFoldOne(bins, n, sid, src, score, keepPpm, binLo, binWidth)
          n += 1
          v
        }
      }
  }

  /** One arrival of the quality-gate fold, shared verbatim by the
    * streaming processor and the batch replay so the two faces can never
    * drift: verdict against the pre-arrival histogram, then the arrival
    * enters its bin (mutates `bins`). `(nPrev+1)·keepPpm` stays in 64-bit
    * to ~9.2e12 arrivals per source — beyond any real stream.
    */
  private[graft] def qualityFoldOne(
      bins: Array[Long],
      nPrev: Long,
      sid: Long,
      source: String,
      score: Long,
      keepPpm: Long,
      binLo: Long,
      binWidth: Long
  ): graft.model.QualityVerdict = {
    val bin = math.min(math.max(score - binLo, 0L) / binWidth, (bins.length - 1).toLong).toInt
    var nBetter = 0L
    var b = bin + 1
    while (b < bins.length) { nBetter += bins(b); b += 1 }
    val quota = math.max(1L, (nPrev + 1) * keepPpm / 1000000L)
    val keep = nBetter < quota
    bins(bin) += 1
    graft.model.QualityVerdict(sid, source, score, nPrev, nBetter, keep)
  }

  /** First-seen-wins dedup: ValueState[Boolean] "seen" with native state TTL
    * (reference pattern/dedup/Deduplicator.java:18-72).
    */
  class DedupProcessor(ttlMs: Long)
      extends StatefulProcessor[String, StreamEnvelop, StreamEnvelop] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttlConfig(ttlMs))

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamEnvelop],
        timerValues: TimerValues
    ): Iterator[StreamEnvelop] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
      }
    }
  }

  def dedup(
      ds: Dataset[StreamEnvelop],
      key: StreamEnvelop => String,
      ttlMs: Long
  ): Dataset[StreamEnvelop] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .transformWithState(
        new DedupProcessor(ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append()
      )
  }

  /** Latest-value-per-key changelog materialization: ValueState[String]
    * payload with native TTL (reference pattern/materialization/
    * Materializer.java:19-166). LWW merge; delete clears state.
    */
  class MaterializeProcessor(ttlMs: Long, isDelete: StreamEnvelop => Boolean)
      extends StatefulProcessor[String, StreamEnvelop, ChangelogEvent] {
    @transient private var current: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      current = getHandle.getValueState[String]("current", Encoders.STRING, ttlConfig(ttlMs))

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamEnvelop],
        timerValues: TimerValues
    ): Iterator[ChangelogEvent] =
      rows.flatMap { e =>
        val existing = if (current.exists()) Option(current.get()) else None
        if (isDelete(e)) {
          current.clear()
          existing.map(b => ChangelogEvent("DELETE", key, Some(b), None, e.eventTime))
        } else {
          current.update(e.payloadJson)
          existing match {
            case None => Some(ChangelogEvent("INSERT", key, None, Some(e.payloadJson), e.eventTime))
            case Some(b) => Some(ChangelogEvent("UPDATE", key, Some(b), Some(e.payloadJson), e.eventTime))
          }
        }
      }
  }

  def materialize(
      ds: Dataset[StreamEnvelop],
      isDelete: StreamEnvelop => Boolean,
      ttlMs: Long
  ): Dataset[ChangelogEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.primaryKey)
      .transformWithState(
        new MaterializeProcessor(ttlMs, isDelete),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append()
      )
  }

  /** Fused CDC pipeline state: dedup-by-(key,eventTime) AND payload
    * change-suppression in ONE keyed state pass — what MongoToKafka's
    * Deduplicator→StatefulMerger chain becomes when productionized (one
    * shuffle, one state lookup per event, instead of two stateful hops;
    * chaining arbitrary flatMapGroupsWithState operators is also not
    * supported by the engine, so fusing is the correct streaming shape).
    * MapState tracks seen event-times per key, ValueState the last payload
    * hash, both with native TTL.
    */
  class CdcPipelineProcessor(ttlMs: Long, excludedFields: Set[String])
      extends StatefulProcessor[String, StreamEnvelop, StreamEnvelop] {
    @transient private var seenTs: MapState[Long, Boolean] = _
    @transient private var lastHash: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seenTs = getHandle.getMapState[Long, Boolean](
        "seenTs", Encoders.scalaLong, Encoders.scalaBoolean, ttlConfig(ttlMs))
      lastHash = getHandle.getValueState[Long]("lastHash", Encoders.scalaLong, ttlConfig(ttlMs))
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamEnvelop],
        timerValues: TimerValues
    ): Iterator[StreamEnvelop] =
      rows.filter { e =>
        val ts = micros(e.eventTime) // micros: ms would merge distinct events
        if (seenTs.containsKey(ts)) false // duplicate (key, eventTime)
        else {
          seenTs.updateValue(ts, true)
          // __op joins the composite (reference MongoToKafkaJob buildChain):
          // a DELETE whose payload canonicalizes equal to the prior event's
          // payload must still reach the sink.
          val h = StatefulMerger.hashPayload(e.payloadJson, excludedFields, Some(e.operation))
          val changed = !lastHash.exists() || lastHash.get() != h
          if (changed) lastHash.update(h)
          changed
        }
      }.toVector.iterator
  }

  def cdcPipeline(
      ds: Dataset[StreamEnvelop],
      ttlMs: Long,
      excludedFields: Set[String]
  ): Dataset[StreamEnvelop] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.primaryKey)
      .transformWithState(
        new CdcPipelineProcessor(ttlMs, excludedFields),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append()
      )
  }

  /** One update of one session window (a changelog of session results):
    * `firing` = 1 for the on-close emission, 2+ for allowedLateness
    * re-firings caused by late events.
    */
  final case class SessionUpdate(
      key: String,
      sessionStartUs: Long,
      sessionEndUs: Long,
      eventCount: Long,
      durationMs: Long,
      actions: String,
      firing: Int
  )

  private[stateful] final case class SessEvent(tsUs: Long, tie: String, action: String)
  private[stateful] final case class SessWindow(
      startUs: Long,
      endUs: Long, // last event + gap
      events: Seq[SessEvent],
      firings: Int // 0 = not yet fired
  )
  private[stateful] final case class SessState(windows: Seq[SessWindow])

  /** Event-time session windows WITH Flink's `allowedLateness` re-firing
    * (reference pattern/session/SessionAnalyzer.java:76-78): the built-in
    * `session_window` fires once on close (append-only), so this face keeps
    * session buffers in transformWithState state with event-time timers.
    *
    * Spark drops input rows older than the stream's watermark before they
    * reach a stateful operator, so the engine watermark is DELAYED by
    * lateness + gap (withWatermark delay = out-of-orderness + lateness +
    * gap) and every timer compensates by firing `lateness + gap` early:
    * with flinkWm = sparkWm + lateness + gap,
    *
    *  - close timer at (end − lateness − gap) ⇔ flinkWm ≥ end → session
    *    fires (firing 1) exactly when Flink's on-watermark firing would
    *  - a late event that passed the filter and lands in a FIRED session
    *    merges into the kept buffer and RE-FIRES immediately (firing 2, 3…)
    *  - cleanup timer at (end − gap) ⇔ flinkWm ≥ end + lateness — Flink's
    *    state cleanup horizon
    *  - admission boundary: Spark's filter drops ts < flinkWm − lateness −
    *    gap ⇔ ts + gap + lateness < flinkWm — BYTE-EXACT Flink semantics
    *    (Flink keeps a session row while its window is within lateness:
    *    ts + gap + lateness > flinkWm). The extra gap in the delay exists
    *    purely to close what used to be a gap-width dropped sliver; it
    *    admits no row the operator doesn't immediately absorb or re-fire
    *
    * Emits an update stream (append sink of session-result versions keyed
    * by (key, sessionStartUs); downstream compacts last-firing-wins —
    * note a late MERGE that shifts a fired window's start emits under the
    * new identity and leaves the old row stale, exactly as Flink does).
    *
    * State shape: the per-key window buffer lives in ONE ValueState, so a
    * batch pays O(buffered events) ser/de per touched key. Right for
    * session-sized buffers (the operator's contract); a workload buffering
    * thousands of events per key should move the event lists to ListState
    * (append-only delta writes) and keep only window bounds here.
    */
  class SessionLatenessProcessor(gapMs: Long, latenessMs: Long)
      extends StatefulProcessor[String, StreamEnvelop, SessionUpdate] {
    @transient private var st: ValueState[SessState] = _

    /** Every timer fires this much earlier than its Flink-time meaning —
      * the exact lag [[sessionsWithLateness]] adds to the watermark delay.
      */
    private val wmLagMs = latenessMs + gapMs

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sessions", Encoders.product[SessState], TTLConfig.NONE)

    private def result(key: String, w: SessWindow): SessionUpdate = {
      val sorted = w.events.sortBy(e => (e.tsUs, e.tie))
      SessionUpdate(
        key, w.startUs, w.endUs, w.events.size.toLong,
        (w.endUs - w.startUs) / 1000L,
        sorted.map(_.action).mkString(","),
        w.firings)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamEnvelop],
        timerValues: TimerValues
    ): Iterator[SessionUpdate] = {
      val gapUs = gapMs * 1000L
      var windows = if (st.exists()) st.get().windows else Seq.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
      rows.foreach { e =>
        val tsUs = micros(e.eventTime) // micros: batch face orders/bounds in µs
        val ev = SessEvent(tsUs, e.traceId, e.operation)
        // touch-merge every window overlapping [ts, ts+gap] (same boundary
        // semantics as session_window / the batch face)
        val (overlapping, rest) = windows.partition(w =>
          tsUs <= w.endUs && tsUs + gapUs >= w.startUs)
        // superseded components' pending timers would otherwise accumulate
        // one per extension and fire useless handleExpiredTimer passes;
        // same-key windows can't share an expiry (disjoint ⇒ distinct ends)
        overlapping.foreach { w =>
          if (w.firings == 0) getHandle.deleteTimer(w.endUs / 1000L - wmLagMs)
          else getHandle.deleteTimer(w.endUs / 1000L - gapMs)
        }
        val merged = SessWindow(
          startUs = (tsUs +: overlapping.map(_.startUs)).min,
          endUs = ((tsUs + gapUs) +: overlapping.map(_.endUs)).max,
          events = overlapping.flatMap(_.events) :+ ev,
          // max, not sum: merging two fired components must yield the NEXT
          // firing number (…, n, n+1), not a skip
          firings = (0 +: overlapping.map(_.firings)).max
        )
        if (merged.firings > 0) {
          // late event into an already-fired session: re-fire NOW. Like
          // Flink, a merge that shifts the window start emits under the NEW
          // (key, startUs) identity and the previously-fired row goes stale
          // (Flink does not retract either); downstream last-firing-wins
          // compaction supersedes same-identity rows only.
          val refired = merged.copy(firings = merged.firings + 1)
          out += result(key, refired)
          windows = rest :+ refired
          getHandle.registerTimer(refired.endUs / 1000L - gapMs) // fresh cleanup horizon
        } else {
          windows = rest :+ merged
          getHandle.registerTimer(merged.endUs / 1000L - wmLagMs) // close (wmLag-early)
        }
      }
      st.update(SessState(windows))
      out.iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[SessionUpdate] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs()
      if (!st.exists()) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
      var windows = st.get().windows
      // first firing: flink-watermark passed lastEvent+gap
      windows = windows.map { w =>
        if (w.firings == 0 && w.endUs / 1000L - wmLagMs <= expiry) {
          val fired = w.copy(firings = 1)
          out += result(key, fired)
          getHandle.registerTimer(w.endUs / 1000L - gapMs) // cleanup (= end+lateness in flink time)
          fired
        } else w
      }
      // cleanup: flink-watermark passed end + lateness
      windows = windows.filterNot(w => w.firings > 0 && w.endUs / 1000L - gapMs <= expiry)
      if (windows.isEmpty) st.clear() else st.update(SessState(windows))
      out.iterator
    }
  }

  /** See [[SessionLatenessProcessor]]. Applies the lateness-delayed
    * watermark itself; requires the RocksDB state store provider.
    */
  def sessionsWithLateness(
      ds: Dataset[StreamEnvelop],
      gapMs: Long,
      latenessMs: Long,
      outOfOrdernessMs: Long = 0
  ): Dataset[SessionUpdate] = {
    import ds.sparkSession.implicits._
    // delay = ooo + lateness + GAP: the gap term admits the band of
    // very-late rows Flink would still absorb into a session within
    // lateness (ts + gap + lateness > flinkWm) — see the processor scaladoc
    ds.withWatermark("eventTime", s"${outOfOrdernessMs + latenessMs + gapMs} milliseconds")
      .groupByKey(_.primaryKey)
      .transformWithState(
        new SessionLatenessProcessor(gapMs, latenessMs),
        TimeMode.EventTime(),
        OutputMode.Append()
      )
  }

  /** Per-key silence detector with REAL timers: every event re-arms a
    * processing-time timer; expiry emits DISRUPTED, the next event after a
    * disruption emits RECOVERED (reference pattern/observability/
    * FlowDisruptionDetector.java:17-91 — registerTimer is the exact
    * `ctx.timerService().registerProcessingTimeTimer` analogue).
    */
  class FlowProcessor(timeoutMs: Long)
      extends StatefulProcessor[String, StreamEnvelop, FlowSignal] {
    @transient private var st: ValueState[FlowState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FlowState](
        "flow",
        Encoders.product[FlowState],
        TTLConfig.NONE
      )

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamEnvelop],
        timerValues: TimerValues
    ): Iterator[FlowSignal] = {
      val wasDisrupted = st.exists() && st.get().disrupted
      val lastTs = rows.foldLeft(0L)((acc, e) => math.max(acc, e.eventTime.getTime))
      // re-arm: drop old timers, register a fresh one. timeoutMs <= 0
      // disables detection (the sync-test contract FlowDisruptionDetector
      // .streaming documents) — an always-now timer would otherwise emit a
      // DISRUPTED/RECOVERED storm every batch.
      if (timeoutMs > 0) {
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      st.update(FlowState(lastTs, disrupted = false))
      if (wasDisrupted)
        Iterator.single(
          FlowSignal(key, new Timestamp(lastTs),
            new Timestamp(timerValues.getCurrentProcessingTimeInMs()), "RECOVERED"))
      else Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[FlowSignal] = {
      val s = if (st.exists()) st.get() else FlowState(0L, disrupted = false)
      st.update(s.copy(disrupted = true))
      Iterator.single(
        FlowSignal(key, new Timestamp(s.lastEventMs),
          new Timestamp(timerValues.getCurrentProcessingTimeInMs()), "DISRUPTED"))
    }
  }

  def flowDisruption(
      ds: Dataset[StreamEnvelop],
      key: StreamEnvelop => String,
      timeoutMs: Long
  ): Dataset[FlowSignal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .transformWithState(
        new FlowProcessor(timeoutMs),
        // timers disabled entirely when detection is off — ProcessingTime
        // mode would keep micro-batches running continuously for nothing
        if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append()
      )
  }
}
