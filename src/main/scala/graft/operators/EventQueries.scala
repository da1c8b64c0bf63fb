package graft.operators

import graft.{QueryDef, Tables}
import graft.streaming.EventStream

/** Driver-facing queries over the event-time windowing surface
  * ([[graft.streaming.EventStream]]). Both queries run THE SAME code path
  * Structured Streaming executes (`tumblingAgg`/`sessionAgg` accept batch or
  * streaming DataFrames) — the batch run here is what the DuckDB oracle can
  * check; StreamingSpec asserts the streaming run produces identical rows.
  *
  * Timestamp precision: the raw `ts` is nanosecond (read as Long); the
  * event-time column truncates to µs exactly like DuckDB's TIMESTAMP read of
  * the same parquet, so window/session boundaries agree across engines.
  */
object EventQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q27_tumbling_window",
      (s, d) => EventStream.tumblingAgg(Tables.events(s, d)),
      Some("""SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2"""),
      headline = true
    ),

    QueryDef(
      "q28_session_window",
      // session_window merges events with gap < 30 min (a diff of exactly
      // the gap starts a new session — hence >= in the oracle's lag form)
      (s, d) => EventStream.sessionAgg(Tables.events(s, d)),
      Some("""WITH o AS (SELECT user_id, event_id, value, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
                FROM events),
              sess AS (SELECT user_id, event_id, value,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM o)
              SELECT user_id, min(event_id) AS first_event,
                     max(event_id) AS last_event, count(*) AS n_events,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM sess GROUP BY user_id, sid""")
    )
  )
}
