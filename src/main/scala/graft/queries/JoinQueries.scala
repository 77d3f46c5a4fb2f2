package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.joins.{DynamicJoiner, SaltedJoin, StaticJoiner}

/** Verification queries for the join operators (SURVEY §2.5 J1/J2). */
object JoinQueries {

  private val envCte = s"WITH env AS (${Tables.envelopesSql})"

  // ------------------------------------------------- J2 static broadcast join
  /** Enrich lineitem with a filtered part dim; misses pass through with null
    * (reference miss-passthrough behavior).
    */
  def j2StaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val ref = Tables.part(spark, dir).filter(col("p_size") < 30)
    StaticJoiner("l_partkey", "p_partkey")
      .enrich(li, ref, Seq("p_brand"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"))
  }

  val j2Sql: String =
    """SELECT l_orderkey, l_linenumber, p_brand
      |FROM lineitem
      |LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size < 30) p
      |  ON l_partkey = p_partkey""".stripMargin

  /** Last-write-wins compaction of a keyed changelog (the BroadcastState
    * replacement semantics): newest event payload per user.
    */
  def j2RefLww(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.eventsAsEnvelopes(spark, dir)
    StaticJoiner("user", "primaryKey")
      .latestPerKey(env, "eventTime", "event_id")
      .select(
        col("primaryKey"),
        get_json_object(col("payloadJson"), "$.k").as("latest_k"),
        unix_micros(col("eventTime")).as("ts_us")
      )
  }

  val j2LwwSql: String =
    s"""$envCte
       |SELECT primaryKey, json_extract_string(payloadJson, '$$.k') AS latest_k,
       |  epoch_us(eventTime) AS ts_us
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY primaryKey ORDER BY eventTime DESC, event_id DESC) AS rn
       |  FROM env)
       |WHERE rn = 1""".stripMargin

  // --------------------------------------------- J1 dynamic (TTL-window) join
  /** clicks LEFT-joined to purchases of the same user within ±30 min —
    * the order/payment join shape (N:M within TTL, unmatched left emitted).
    */
  def j1DynamicJoin(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.eventsAsEnvelopes(spark, dir)
    val clicks = env
      .filter(col("source") === "click")
      .select(
        col("primaryKey").as("l_key"),
        col("event_id").as("l_id"),
        col("eventTime").as("l_ts")
      )
    val purchases = env
      .filter(col("source") === "purchase")
      .select(
        col("primaryKey").as("r_key"),
        col("event_id").as("r_id"),
        col("eventTime").as("r_ts")
      )
    DynamicJoiner("l_key", "r_key", "l_ts", "r_ts", ttlMs = 30 * 60 * 1000, joinType = "left_outer")
      .batch(clicks, purchases)
      .select(
        col("l_id"),
        col("r_id"),
        unix_micros(col("l_ts")).as("l_us"),
        unix_micros(col("r_ts")).as("r_us")
      )
  }

  val j1Sql: String =
    s"""$envCte,
       |l AS (SELECT primaryKey AS l_key, event_id AS l_id, eventTime AS l_ts
       |      FROM env WHERE source = 'click'),
       |r AS (SELECT primaryKey AS r_key, event_id AS r_id, eventTime AS r_ts
       |      FROM env WHERE source = 'purchase')
       |SELECT l_id, r_id, epoch_us(l_ts) AS l_us, epoch_us(r_ts) AS r_us
       |FROM l LEFT JOIN r
       |  ON l_key = r_key
       | AND epoch_us(r_ts) >= epoch_us(l_ts) - 1800000000
       | AND epoch_us(r_ts) <= epoch_us(l_ts) + 1800000000""".stripMargin

  /** Full-outer variant: both unmatched sides surface (reference RIGHT/FULL
    * via RightEmitFunction; here the join emits them natively).
    */
  def j1DynamicFull(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.eventsAsEnvelopes(spark, dir)
    val signups = env
      .filter(col("source") === "signup")
      .select(col("primaryKey").as("l_key"), col("event_id").as("l_id"), col("eventTime").as("l_ts"))
    val errors = env
      .filter(col("source") === "error")
      .select(col("primaryKey").as("r_key"), col("event_id").as("r_id"), col("eventTime").as("r_ts"))
    DynamicJoiner("l_key", "r_key", "l_ts", "r_ts", ttlMs = 10 * 60 * 1000, joinType = "full_outer")
      .batch(signups, errors)
      .select(col("l_id"), col("r_id"))
  }

  val j1FullSql: String =
    s"""$envCte,
       |l AS (SELECT primaryKey AS l_key, event_id AS l_id, eventTime AS l_ts
       |      FROM env WHERE source = 'signup'),
       |r AS (SELECT primaryKey AS r_key, event_id AS r_id, eventTime AS r_ts
       |      FROM env WHERE source = 'error')
       |SELECT l_id, r_id
       |FROM l FULL OUTER JOIN r
       |  ON l_key = r_key
       | AND epoch_us(r_ts) >= epoch_us(l_ts) - 600000000
       | AND epoch_us(r_ts) <= epoch_us(l_ts) + 600000000""".stripMargin

  /** Arrival-time-axis face (VERDICT r2 #6): the reference's TTL actually
    * runs on PROCESSING-time arrival distance (DynamicJoiner.java:206-229),
    * not event time. [[DynamicJoiner.stampArrival]] stamps wall-clock at
    * ingest — non-oracle-able — so this query stamps a DETERMINISTIC
    * synthetic arrival (eventTime + per-row ingest delay, out-of-order by
    * construction: delay varies per event) and passes the stamped column as
    * the join axis. Pairs match on arrival distance, NOT event-time
    * distance: two events 1 ms apart in event time can miss when their
    * ingest delays differ by more than the TTL, exactly the reference's
    * buffer behavior.
    */
  def j1DynamicArrival(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.eventsAsEnvelopes(spark, dir)
    // synthetic ingest delay: 0-6 min, keyed off event_id (deterministic)
    def stamped(src: String, prefix: String) = env
      .filter(col("source") === src)
      .withColumn(
        "_arr",
        timestamp_micros(unix_micros(col("eventTime")) + (col("event_id") % 7) * 60000000L))
      .select(
        col("primaryKey").as(s"${prefix}_key"),
        col("event_id").as(s"${prefix}_id"),
        col("_arr").as(s"${prefix}_arr"))
    DynamicJoiner("l_key", "r_key", "l_arr", "r_arr", ttlMs = 10 * 60 * 1000, joinType = "left_outer")
      .batch(stamped("click", "l"), stamped("purchase", "r"))
      .select(
        col("l_id"),
        col("r_id"),
        unix_micros(col("l_arr")).as("l_us"),
        unix_micros(col("r_arr")).as("r_us")
      )
  }

  val j1ArrivalSql: String =
    s"""$envCte,
       |l AS (SELECT primaryKey AS l_key, event_id AS l_id,
       |             epoch_us(eventTime) + (event_id % 7) * 60000000 AS l_us
       |      FROM env WHERE source = 'click'),
       |r AS (SELECT primaryKey AS r_key, event_id AS r_id,
       |             epoch_us(eventTime) + (event_id % 7) * 60000000 AS r_us
       |      FROM env WHERE source = 'purchase')
       |SELECT l_id, r_id, l_us, r_us
       |FROM l LEFT JOIN r
       |  ON l_key = r_key
       | AND r_us >= l_us - 600000000
       | AND r_us <= l_us + 600000000""".stripMargin

  // ------------------------------------------------------ J3 skew-salted join
  /** Worst-case key distribution: two-thirds of ALL events collapse onto ONE
    * join key ("hot"), then enrich against a per-key dim through
    * [[SaltedJoin]] — the static escape hatch when even AQE skew splitting
    * can't save a single dominant key. The oracle replays the plain
    * (unsalted) join, proving salting changes partitioning, never results;
    * ScaleMechanicsSpec asserts the exchange actually fans the hot key out
    * across salt partitions.
    */
  def j3SkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.eventsAsEnvelopes(spark, dir)
    val hotKey = when(col("primaryKey").cast("long") % 3 =!= 0, lit("hot"))
      .otherwise(col("primaryKey"))
    val skewed = env.select(hotKey.as("k"), col("traceId"), col("event_id"))
    val dim = skewed.select(col("k")).distinct()
      .withColumn("dim_tag", concat(lit("ref:"), col("k")))
    SaltedJoin.join(skewed, dim, "k", saltBy = col("event_id"), n = 8, joinType = "left_outer")
      .select(col("traceId"), col("k"), col("dim_tag"))
  }

  val j3SkewSaltedSql: String =
    s"""$envCte,
       |sk AS (
       |  SELECT CASE WHEN CAST(primaryKey AS BIGINT) % 3 <> 0 THEN 'hot'
       |              ELSE primaryKey END AS k,
       |         traceId
       |  FROM env)
       |SELECT traceId, k, 'ref:' || k AS dim_tag FROM sk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j3_skew_salted" -> j3SkewSalted,
    "j2_static_enrich" -> j2StaticEnrich,
    "j2_ref_lww" -> j2RefLww,
    "j1_dynamic_join" -> j1DynamicJoin,
    "j1_dynamic_full" -> j1DynamicFull,
    "j1_dynamic_arrival" -> j1DynamicArrival
  )

  val oracles: Map[String, String] = Map(
    "j3_skew_salted" -> j3SkewSaltedSql,
    "j2_static_enrich" -> j2Sql,
    "j2_ref_lww" -> j2LwwSql,
    "j1_dynamic_join" -> j1Sql,
    "j1_dynamic_full" -> j1FullSql,
    "j1_dynamic_arrival" -> j1ArrivalSql
  )
}
