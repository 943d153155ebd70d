package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table (batch shape of the
  * streaming pipeline in graft.streaming). Timestamps are ns-precision in
  * the parquet; outputs use truncated/derived values that are stable across
  * Spark (µs) and DuckDB (ns) readers.
  */
object Events {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q33_events_hourly",
      (s, d) => load(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             |event_type, count(*) AS n, round(sum(value),2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    QueryDef("q34_events_sessions",
      (s, d) => {
        // Sessionization: a >30 min silence starts a new session. Epoch
        // seconds are floored identically on both engines.
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        load(s, d, "events")
          .withColumn("sec", col("ts").cast("long"))
          .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
          .withColumn("new_session",
            when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT user_id, sec, sec - lag(sec, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |    FROM (SELECT user_id, ts, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
             |  )
             |) GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("q35_events_json",
      (s, d) => load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)
        .orderBy(col("event_id"))
        .limit(300),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
             |ORDER BY event_id LIMIT 300""".stripMargin)),

    QueryDef("q92_retention_cohorts",
      (s, d) => {
        // Weekly retention cohorts: users grouped by first-seen week,
        // counted per week offset they remain active — the standard
        // product-analytics triangle. Two aggregations + one join on
        // user_id; both week values are Monday-truncated so the
        // day-difference is an exact multiple of 7 in both engines.
        val ev = load(s, d, "events")
        val first = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort"))
        val active = ev
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        active.join(first, "user_id")
          .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("wk").cast("date"), col("cohort").cast("date")) / 7)
              .cast("int").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
             |          FROM events GROUP BY user_id),
             |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
             |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
             |  CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
             |  count(*) AS n_users
             |FROM a JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q36_events_funnel",
      (s, d) => {
        // Per-user funnel: signup -> click -> purchase presence flags.
        load(s, d, "events")
          .groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup", 1).otherwise(0)).as("did_signup"),
            max(when(col("event_type") === "click", 1).otherwise(0)).as("did_click"),
            max(when(col("event_type") === "purchase", 1).otherwise(0)).as("did_purchase"))
          .groupBy(col("did_signup"), col("did_click"), col("did_purchase"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("did_signup"), col("did_click"), col("did_purchase"))
      },
      Some("""SELECT did_signup, did_click, did_purchase, count(*) AS n_users FROM (
             |SELECT user_id,
             |max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS did_signup,
             |max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS did_click,
             |max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS did_purchase
             |FROM events GROUP BY user_id)
             |GROUP BY 1,2,3 ORDER BY did_signup, did_click, did_purchase""".stripMargin)),

    QueryDef("qs01_stream_hourly",
      (s, d) => {
        // STREAMING gate: the watermarked hourly aggregation runs as a
        // real Structured Streaming query (file source → watermark →
        // windowed agg → append-mode memory sink, processAllAvailable).
        // Append mode emits exactly the windows whose end <= the final
        // watermark (max event time − 30 min) — the oracle encodes that
        // same closure rule in SQL, so this pins streaming semantics, not
        // just the aggregation.
        val out = graft.streaming.EventsStream.runBatchAsStream(s, d, "qs01_hourly_mem")
        out.select(
            date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             |event_type, count(*) AS n, round(sum(value),2) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
             |ORDER BY hour, event_type""".stripMargin)),

    QueryDef("qs02_stream_dedup",
      (s, d) => {
        // STREAMING ingestion dedup gate: the events table plus a
        // planted duplicate subset (every 3rd event re-delivered, the
        // at-least-once upstream shape) streams through the watermarked
        // dropDuplicatesWithinWatermark; the memory sink must hold
        // exactly the original row set — aggregated per type so the
        // oracle is the plain batch aggregation over events.
        val ev = load(s, d, "events")
        val tmp = graft.core.TempDirs.deleteOnExit(
          java.nio.file.Files.createTempDirectory("qs02").toString)
        ev.coalesce(1).write.mode("append").parquet(tmp)
        ev.filter(col("event_id") % 3 === 0)
          .coalesce(1).write.mode("append").parquet(tmp)
        val deduped = graft.streaming.EventsStream
          .runDedupAsStream(s, tmp, "qs02_dedup_mem")
        deduped.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value),2) AS total_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("qs04_stream_join",
      (s, d) => {
        // STREAM-STREAM JOIN gate: click→purchase attribution (same
        // user, purchase within 1 h after the click) runs as a real
        // Structured Streaming two-source inner interval join with
        // watermarks on both sides. Inner matches emit regardless of
        // watermark closure, so the oracle is the plain batch interval
        // join; the summary is computed batch-side from the sink.
        val ev = load(s, d, "events")
        val tmp = graft.core.TempDirs.deleteOnExit(
          java.nio.file.Files.createTempDirectory("qs04").toString)
        ev.coalesce(1).write.mode("append").parquet(tmp)
        graft.streaming.EventsStream
          .runIntervalJoinAsStream(s, tmp, "qs04_join_mem")
          .groupBy(col("c_user").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            round(sum(col("value")), 2).as("attributed_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
             |SELECT c.user_id, count(*) AS n_pairs,
             |  round(sum(p.value), 2) AS attributed_value
             |FROM c JOIN p ON c.user_id = p.user_id
             |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
             |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin))
  )
}
