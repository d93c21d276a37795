package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch analytics over the `events` table (SURVEY §2.4 batch-checkable
  * side: tumbling-window aggregation, sessionization, JSON props).
  *
  * The streaming versions of these (readStream + watermark + window) are
  * exercised in ScalaTest via MemoryStream; here the same logic runs in
  * batch so the DuckDB oracle can check it.
  *
  * Event time: parquet stores TIMESTAMP(NANOS); Spark exposes `ts_ns`
  * (long, exact) via Tables. All bucket arithmetic uses exact integer
  * division (`div`), matching DuckDB's `epoch_ns(ts) // n` — floating
  * division would mis-bucket boundary-aligned timestamps.
  */
object EventQueries {

  private val TEN_MIN_NS = 600000000000L  // 10 min in ns
  private val GAP_NS = 1800000000000L     // 30 min session gap

  // Tumbling 10-minute window aggregate (W3 batch-equivalent).
  // Scale: single shuffle on (win_start, event_type); partial aggs map-side.
  private val evWindow = QueryDef("ev_window_agg", Some(
    s"""SELECT (epoch_ns(ts) // $TEN_MIN_NS) * 600 AS win_start,
       |       event_type,
       |       count(*)        AS n_events,
       |       sum(value)      AS total_value,
       |       count(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).events
      .groupBy(
        (expr(s"ts_ns div $TEN_MIN_NS") * 600).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("total_value"),
        countDistinct("user_id").as("n_users"))
  }

  // Sessionization: 30-min-gap sessions per user via lag + running sum —
  // the batch mirror of session_window / W6 stateful sessionizer.
  // Scale: one shuffle on user_id, in-partition sort by time; groupBy
  // reuses the same partitioning (no second shuffle needed by plan).
  private val evSession = QueryDef("ev_sessionize", Some(
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events
       |), marked AS (
       |  SELECT user_id, event_id, ts_ns,
       |         CASE WHEN ts_ns - lag(ts_ns) OVER w > $GAP_NS OR lag(ts_ns) OVER w IS NULL
       |              THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
       |), sess AS (
       |  SELECT user_id, event_id, ts_ns,
       |         cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM marked)
       |SELECT user_id, session_id,
       |       count(*)   AS n_events,
       |       min(ts_ns) AS sess_start_ns,
       |       max(ts_ns) AS sess_end_ns
       |FROM sess GROUP BY user_id, session_id""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .select("user_id", "event_id", "ts_ns")
      .withColumn("is_new",
        when(col("ts_ns") - lag("ts_ns", 1).over(w) > GAP_NS
          || lag("ts_ns", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("is_new").over(wf))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_ns").as("sess_start_ns"),
        max("ts_ns").as("sess_end_ns"))
  }

  // JSON props extraction (Q11): get_json_object on the Spark side; the
  // oracle uses regexp extraction (no DuckDB extension dependency) — the
  // props payload is flat {"k": <int>} so both agree.
  private val evJson = QueryDef("ev_json", Some(
    """SELECT event_type,
      |       cast(sum(cast(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
      |       cast(max(cast(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS INT)    AS max_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), max("k").as("max_k"), count(lit(1)).as("n"))
  }

  // Top-20 users by total event value (orderBy+limit → TakeOrderedAndProject).
  private val evTop = QueryDef("ev_top_users", Some(
    """SELECT user_id, sum(value) AS total_value, count(*) AS n_events
      |FROM events GROUP BY user_id
      |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).events
      .groupBy("user_id")
      .agg(sum("value").as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)
  }

  val defs: Seq[QueryDef] = Seq(evWindow, evSession, evJson, evTop)
}
