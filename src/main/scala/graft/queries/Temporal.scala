package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef._

/** Batch analogs of the streaming window operators (SURVEY.md §2.8
  * ST3-ST5): tumbling / sliding / session windows over event time. The
  * same expressions run under `readStream` (see graft.streaming); batch
  * mode gives them a DuckDB oracle. Window starts are emitted as epoch
  * millis — integer, engine-neutral. */
object Temporal {

  /** q30 — tumbling 1-hour window per event_type. */
  def q30(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_millis(col("window.start")).as("ws_ms"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("ws_ms"), col("event_type"))

  private val q30Sql =
    s"""SELECT epoch_ms(date_trunc('hour', ts)) AS ws_ms, event_type,
       | count(*) AS n, ${exactSumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY ws_ms, event_type""".stripMargin

  /** q31 — sliding window (1 hour every 15 min): each event lands in 4
    * windows. Spark plans this as an Expand (4 rows per input) + hash agg;
    * the oracle reproduces the epoch-aligned slide grid with integer
    * arithmetic. */
  def q31(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_millis(col("window.start")).as("ws_ms"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("ws_ms"), col("event_type"))

  private val q31Sql =
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // 900000) * 900000 - i * 900000 AS ws_ms,
       |         event_type, value
       |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS i))
       |SELECT ws_ms, event_type, count(*) AS n, ${exactSumSql("value")} AS total_value
       |FROM g GROUP BY ws_ms, event_type ORDER BY ws_ms, event_type""".stripMargin

  /** q32 — session window (30-min inactivity gap) per user. The oracle is
    * the classic gaps-and-islands rewrite; session end = last event +
    * gap, matching Spark's half-open [start, last+gap) semantics. */
  def q32(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("start_ms"))

  private val q32Sql =
    s"""WITH x AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |         OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |y AS (
       |  SELECT user_id, ts, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM x)
       |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
       |  epoch_ms(max(ts)) + 1800000 AS end_ms,
       |  count(*) AS n_events, ${exactSumSql("value")} AS sum_value
       |FROM y GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q30_tumbling_window", q30, Some(q30Sql)),
    QueryDef("q31_sliding_window", q31, Some(q31Sql)),
    QueryDef("q32_session_window", q32, Some(q32Sql)))
}
