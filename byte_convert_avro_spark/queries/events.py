"""Event-stream analytics (batch expressions of the streaming operators;
the Structured Streaming versions live in ``streaming/``).

Time discipline: the events parquet stores ns-precision timestamps, which
Spark's parquet reader only accepts as epoch-ns longs
(``spark.sql.legacy.parquet.nanosAsLong``).  All bucketing/session math is
therefore **integer microseconds** (``ts DIV 1000`` ≡ DuckDB
``epoch_us(ts)``) — no floating point in time arithmetic, so engines agree
bit-for-bit.

Scale notes: tumbling/sliding aggs are single-shuffle groupBys on derived
integer keys; sessionization is two windows over one shuffle on user_id
(the classic gaps-and-islands plan — at 100 TB the shuffle is on the
session key, and AQE handles hot users); the as-of join is a cogrouped
``merge_asof`` per user (partition-local sort-merge, the scalable as-of).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import cents, dsum, hash_bucket, register, t

US_PER_HOUR = 3_600_000_000
US_PER_15MIN = 900_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _ev(spark: SparkSession, sf: str):
    return t(spark, sf, "events").withColumn("ts_us", F.expr("ts DIV 1000"))


# ---------------------------------------------------------------------------
@register(
    "events_hourly_tumbling",
    f"""
    SELECT (epoch_us(ts) // {US_PER_HOUR}) AS hour_bucket,
           strftime(make_timestamp((epoch_us(ts) // {US_PER_HOUR}) * {US_PER_HOUR}),
                    '%Y-%m-%d %H:%M') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf: str):
    """Tumbling 1h window per event type (batch form of the streaming
    windowed agg)."""
    ev = _ev(spark, sf)
    return (
        ev.withColumn("hour_bucket", F.expr(f"ts_us DIV {US_PER_HOUR}"))
        .withColumn(
            "hour_start",
            F.date_format(F.timestamp_micros(F.col("hour_bucket") * US_PER_HOUR), "yyyy-MM-dd HH:mm"),
        )
        .groupBy("hour_bucket", "hour_start", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_sliding_window",
    f"""
    WITH k AS (SELECT unnest(generate_series(0, 3)) AS k)
    SELECT ((epoch_us(ts) // {US_PER_15MIN}) - k) * {US_PER_15MIN} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN k
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf: str):
    """Sliding window: 1h length, 15min slide — each event lands in exactly
    4 windows.  Spark's native ``window()`` generates the replicas; the
    oracle enumerates offsets 0..3 explicitly."""
    ev = _ev(spark, sf).withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
    return (
        ev.groupBy(F.window("ts_ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            (F.col("w.start").cast("long") * 1_000_000).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def events_sessionization(spark: SparkSession, sf: str):
    """Sessionization (30-min inactivity gap) as gaps-and-islands: lag ->
    new-session flag -> running count -> per-session agg.  One shuffle on
    user_id; both windows share it."""
    ev = _ev(spark, sf)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US, 1
        ).when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        dsum("value").alias("session_value"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_asof_purchase_view",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts_us AS purchase_ts_us,
           v.ts_us AS view_ts_us,
           p.ts_us - v.ts_us AS gap_us
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    """,
)
def events_asof_purchase_view(spark: SparkSession, sf: str):
    """As-of join: each purchase matched to the latest view at-or-before it
    for the same user.  Spark lacks a native as-of operator; this is the
    fully-native plan — union both sides tagged, one shuffle on user_id,
    then ``last(view_ts, ignorenulls)`` over an ordered running window.
    Whole-stage codegen end to end, no Python, no range-join explosion;
    ordering (ts, kind) with views first gives allow-exact-match semantics
    identical to DuckDB's ASOF (>=) oracle.

    (``operators/asof.py`` carries the general cogrouped ``merge_asof``
    variant for tolerance/nearest semantics that this trick can't express.)
    """
    ev = _ev(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.lit(1).alias("kind"), F.col("event_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id")
    )
    u = purchases.unionByName(views)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    view_ts = F.last(F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True).over(w)
    return (
        u.withColumn("view_ts_us", view_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "view_ts_us",
            (F.col("ts_us") - F.col("view_ts_us")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_asof_tolerance_30m",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts_us AS purchase_ts_us,
           CASE WHEN p.ts_us - v.ts_us <= 1800000000
                THEN v.ts_us END AS view_ts_us,
           CASE WHEN p.ts_us - v.ts_us <= 1800000000
                THEN p.ts_us - v.ts_us END AS gap_us
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    """,
)
def events_asof_tolerance_30m(spark: SparkSession, sf: str):
    """As-of with tolerance, fully native: each purchase matched to the
    latest same-user view at-or-before it, DROPPED (nulled) when the view
    is older than 30 minutes — ``pd.merge_asof(tolerance=...)`` semantics
    without Python: the union+window as-of plan plus a gap predicate
    (operators/asof.py: asof_join_tolerance_native)."""
    from byte_convert_avro_spark.operators.asof import asof_join_tolerance_native

    ev = _ev(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts_us")
    j = asof_join_tolerance_native(
        purchases, views, on="ts_us", by="user_id",
        tolerance=1_800_000_000, right_cols=[],
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("ts_us_asof").alias("view_ts_us"),
        (F.col("ts_us") - F.col("ts_us_asof")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_daily_gapfill_locf",
    """
    WITH ev AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    daily AS (
      SELECT user_id, day, COUNT(*) AS n_events,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS day_cents
      FROM ev GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, day, CAST(ROUND(value * 100, 0) AS BIGINT) AS close_cents,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM ev
    ),
    closes AS (SELECT user_id, day, close_cents FROM ranked WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM ev GROUP BY 1),
    spine AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM bounds),
    j AS (
      SELECT s.user_id, s.day,
             COALESCE(d.n_events, 0) AS n_events,
             COALESCE(d.day_cents, 0) AS day_cents,
             c.close_cents
      FROM spine s
      LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
      LEFT JOIN closes c ON c.user_id = s.user_id AND c.day = s.day
    )
    SELECT user_id, day, n_events,
           CAST(day_cents AS DOUBLE) / 100.0 AS day_value,
           CAST(last_value(close_cents IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS close_value
    FROM j
    """,
)
def events_daily_gapfill_locf(spark: SparkSession, sf: str):
    """Time-series resample + gap-fill: a dense daily spine per user over
    their observed [first, last] day, zero-filled activity, and the
    last-observation-carried-forward close value — the standard
    "resample('1D').ffill()" shape Spark has no primitive for.

    Plan: per-user bounds are a tiny agg; the spine is sequence()+explode
    (rows = users x own-span days, never global span x all users); LOCF is
    last(ignorenulls) over the per-user ordered window.  Everything
    shuffles on user_id only; integer cents keep the fill engine-exact."""
    ev = _ev(spark, sf).select(
        "user_id", "event_id", "ts_us",
        F.expr("ts_us div 86400000000").alias("day"),
        cents("value").alias("value_cents"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("day_cents"),
        F.max(F.struct("ts_us", "event_id", "value_cents")).alias("_last"),
    )
    bounds = ev.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.coalesce("day_cents", F.lit(0)).cast("double") / 100.0).alias("day_value"),
        (
            F.last(F.col("_last.value_cents"), ignorenulls=True).over(w).cast("double")
            / 100.0
        ).alias("close_value"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_props_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf: str):
    """Semi-structured JSON column access (the engine's envelope output is
    consumed the same way downstream)."""
    ev = t(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_asof_next_purchase",
    """
    WITH u AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *, MIN(CASE WHEN kind = 1 THEN ts_us END) OVER (
                  PARTITION BY user_id ORDER BY ts_us, kind
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
      FROM u
    )
    SELECT event_id AS view_id, user_id, ts_us AS view_ts_us,
           CASE WHEN next_p - ts_us <= 7200000000 THEN next_p END AS purchase_ts_us,
           CASE WHEN next_p - ts_us <= 7200000000 THEN next_p - ts_us END AS gap_us
    FROM w WHERE kind = 0
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf: str):
    """FORWARD as-of under the oracle gate: each view matched to the NEXT
    same-user purchase at-or-after it, nulled beyond a 2h tolerance —
    ``pd.merge_asof(direction='forward', tolerance=...)`` semantics via
    the fully-native union+window plan (operators/asof.py negates the
    time axis and reuses the backward machinery; one shuffle on user_id,
    whole-stage codegen, no Python).  The DuckDB oracle expresses the
    same match as a running MIN over the following frame ordered
    (ts, kind) with purchases after views at equal ts — allow-exact-match
    parity with the operator."""
    from byte_convert_avro_spark.operators.asof import asof_join_tolerance_native

    ev = _ev(spark, sf)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us")
    j = asof_join_tolerance_native(
        views, purchases, on="ts_us", by="user_id",
        tolerance=7_200_000_000, direction="forward", right_cols=[],
    )
    return j.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts_us").alias("view_ts_us"),
        F.col("ts_us_asof").alias("purchase_ts_us"),
        (F.col("ts_us_asof") - F.col("ts_us")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_weekly_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
    )
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           COUNT(*) AS n_users
    FROM act a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_weekly_retention(spark: SparkSession, sf: str):
    """Cohort retention: users grouped by first-seen week, counted in
    every later week they return — the activation/retention triangle
    every product-analytics stack computes.  Weeks are integer epoch-week
    buckets (µs DIV 604800e6) — engine-portable, no calendars.

    Plan: distinct (user, week) and the per-user MIN are both shuffles on
    user_id — co-partitioned, so the join between them is shuffle-free
    after the first exchange; the final count shuffles only the tiny
    (cohort, offset) grid.  Nothing is ever collected."""
    act = (
        _ev(spark, sf)
        .select("user_id", F.expr("ts_us DIV 604800000000").alias("week"))
        .distinct()
    )
    firsts = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(firsts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
@register(
    "events_funnel_conversion",
    """
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_view
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) >= s.t_signup
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t_view
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_view_after_signup,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_view
    """,
)
def events_funnel_conversion(spark: SparkSession, sf: str):
    """Sequential funnel: signup -> first view AT/AFTER the signup ->
    purchase AT/AFTER that view, counted per stage (the ORDER of events
    matters — a purchase before the post-signup view does not convert,
    which no unordered distinct-count can express).

    Plan: three per-user conditional-min aggregations chained by joins on
    user_id — every shuffle is on the same key, so stages co-partition
    after the first exchange; stage counts are single-row aggregates.
    Nothing driver-side, no window over the raw stream."""
    ev = _ev(spark, sf)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_signup"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts_us") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_us") >= F.col("t_view"))
        .select("user_id")
        .distinct()
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_after_signup")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_view")))
    )


# ---------------------------------------------------------------------------
@register(
    "events_rolling_7d_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ), bounds AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud
    ), contrib AS (
      SELECT DISTINCT ud.user_id, ud.day + k.k AS obs_day
      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) k
    )
    SELECT c.obs_day AS day, COUNT(*) AS active_users_7d
    FROM contrib c, bounds b
    WHERE c.obs_day BETWEEN b.d0 AND b.d1
    GROUP BY c.obs_day
    """,
)
def events_rolling_7d_active_users(spark: SparkSession, sf: str):
    """Rolling 7-day distinct active users per day (the WAU curve) —
    COUNT(DISTINCT) over a sliding window, which no window frame can
    express directly in either engine.  Re-expressed scale-sane: dedup to
    (user, day), explode each activity into the <= 7 observation days it
    covers (bounded fan-out), distinct again, count per day.

    Plan: both distincts are single shuffles on (user, day); the x7
    explode happens AFTER the first dedup, so the fan-out input is
    |users x active-days|, never raw events.  Days are integer epoch-days
    (µs DIV 86400e6) — engine-portable."""
    ev = _ev(spark, sf)
    ud = ev.select("user_id", F.expr("ts_us DIV 86400000000").alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    contrib = (
        ud.select(
            "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("obs_day")
        )
        .distinct()
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter((F.col("obs_day") >= F.col("d0")) & (F.col("obs_day") <= F.col("d1")))
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.count("*").alias("active_users_7d"))
    )


# ---------------------------------------------------------------------------
@register(
    "events_peak_hour_per_user",
    f"""
    WITH h AS (
      SELECT user_id,
             CAST((epoch_us(ts) // {US_PER_HOUR}) % 24 AS INT) AS hour_of_day,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT user_id, hour_of_day AS peak_hour, n_events
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY n_events DESC, hour_of_day) AS rn FROM h)
    WHERE rn = 1
    """,
)
def events_peak_hour_per_user(spark: SparkSession, sf: str):
    """Groupwise ARGMAX: each user's busiest hour of day (0-23, integer
    epoch-hour arithmetic — no timezone anywhere) with its event count;
    ties break to the earliest hour.  The two-stage shape is the scale
    pattern: the (user, hour) pre-aggregation shrinks the window input to
    <= 24 rows per user BEFORE the per-user ranking window, so the
    row_number never sorts raw events."""
    ev = _ev(spark, sf)
    h = (
        ev.select(
            "user_id",
            (F.expr(f"ts_us DIV {US_PER_HOUR}") % 24).cast("int").alias("hour_of_day"),
        )
        .groupBy("user_id", "hour_of_day")
        .agg(F.count("*").alias("n_events"))
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"), "hour_of_day")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("hour_of_day").alias("peak_hour"), "n_events")
    )


# ---------------------------------------------------------------------------
@register(
    "events_longest_daily_streak",
    f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // {24 * US_PER_HOUR} AS BIGINT) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS len,
             MIN(day) AS start_day, MAX(day) AS end_day
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, len AS streak_days, start_day, end_day
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY len DESC, start_day) AS rn FROM streaks)
    WHERE rn = 1
    """,
)
def events_longest_daily_streak(spark: SparkSession, sf: str):
    """GAPS-AND-ISLANDS: each user's longest run of CONSECUTIVE active
    days (integer epoch-days — no calendar/timezone anywhere).  The
    classic island key is ``day - row_number`` (constant within a
    consecutive run); longest streak per user ties break to the earliest
    start.  Scale: the distinct collapses events to (user, day) FIRST, so
    both windows and the rollup run over <= days-per-user rows on one
    user_id-keyed shuffle."""
    ev = _ev(spark, sf)
    days = ev.select(
        "user_id", F.expr(f"ts_us DIV {24 * US_PER_HOUR}").alias("day")
    ).distinct()
    wd = W.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("island", F.col("day") - F.row_number().over(wd))
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_days"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    wr = W.partitionBy("user_id").orderBy(F.desc("streak_days"), "start_day")
    return (
        streaks.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "start_day", "end_day")
    )


# ---------------------------------------------------------------------------
#: the value-band dimension of events_value_band_totals — one definition
#: drives both engines (name, lo inclusive, hi exclusive)
VALUE_BANDS = [
    ("micro", 0.0, 5.0),
    ("small", 5.0, 25.0),
    ("medium", 25.0, 100.0),
    ("large", 100.0, 250.0),
    ("jumbo", 250.0, 1e9),
]


@register(
    "events_value_band_totals",
    f"""
    WITH bands(band, lo, hi) AS (VALUES {", ".join(
        f"('{n}', {lo}, {hi})" for n, lo, hi in VALUE_BANDS
    )})
    SELECT b.band,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def events_value_band_totals(spark: SparkSession, sf: str):
    """Non-equi RANGE join — the join shape the rest of the registry
    doesn't exercise: events joined to a banded-range dimension on
    ``lo <= value < hi``.  With the tiny band table broadcast, Spark
    plans a BroadcastNestedLoopJoin — exactly right here: each event
    tests 5 range predicates map-side, no shuffle of the fact side at
    all (the only shuffle is the final band rollup).  The banded-dim
    range join is the standard pattern for bucketing facts by an
    irregular dimension (tariffs, SLA tiers, price bands) where equi-join
    bucketing can't express the predicate."""
    ev = _ev(spark, sf)
    bands = spark.createDataFrame(VALUE_BANDS, "band string, lo double, hi double")
    j = ev.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
@register(
    "sessions_busy_hour_overlap",
    f"""
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), sessions AS (
      SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
      FROM numbered GROUP BY user_id, session_idx
    ), busy AS (
      SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
             (epoch_us(ts) // {US_PER_HOUR}) * {US_PER_HOUR} AS hr_start_us,
             (epoch_us(ts) // {US_PER_HOUR}) * {US_PER_HOUR} + {US_PER_HOUR} - 1
               AS hr_end_us
      FROM events GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
    )
    SELECT s.user_id, s.session_start_us, s.session_end_us,
           b.hour_bucket,
           LEAST(s.session_end_us, b.hr_end_us)
             - GREATEST(s.session_start_us, b.hr_start_us) + 1 AS overlap_us
    FROM sessions s
    JOIN busy b ON s.session_start_us <= b.hr_end_us
               AND b.hr_start_us <= s.session_end_us
    """,
)
def sessions_busy_hour_overlap(spark: SparkSession, sf: str):
    """INTERVAL-OVERLAP JOIN — user sessions paired with corpus-wide busy
    hours (>= 5 events) they overlap, with the exact overlap duration.
    The naive theta-join on the overlap predicate plans a nested loop
    over |sessions| x |hours|; the engine instead runs
    operators/intervals.interval_overlap_join: both interval sets explode
    into the hour buckets they touch (sessions are sub-hour, so 1-2 rows
    each), equi-join on the bucket — the shuffle key — and the exact
    overlap predicate verifies partition-locally.  Pair cost equals true
    temporal density (sessions per busy hour), never the cross product.
    The oracle runs the plain overlap join — same pairs, same
    arithmetic."""
    from byte_convert_avro_spark.operators.intervals import interval_overlap_join

    sess = events_sessionization(spark, sf).select(
        "user_id", "session_start_us", "session_end_us"
    )
    ev = _ev(spark, sf)
    busy = (
        ev.groupBy(F.expr(f"ts_us DIV {US_PER_HOUR}").alias("hour_bucket"))
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 5)
        .select(
            "hour_bucket",
            (F.col("hour_bucket") * US_PER_HOUR).alias("hr_start_us"),
            (F.col("hour_bucket") * US_PER_HOUR + US_PER_HOUR - 1).alias("hr_end_us"),
        )
    )
    # busy-hour intervals are bucket-aligned, so each (session, hour)
    # pair is witnessed by exactly one bucket — the dedup shuffle is
    # provably unnecessary
    j = interval_overlap_join(
        sess, busy,
        "session_start_us", "session_end_us", "hr_start_us", "hr_end_us",
        bucket=US_PER_HOUR, dedupe=False,
    )
    return j.select(
        "user_id", "session_start_us", "session_end_us", "hour_bucket",
        (
            F.least("session_end_us", "hr_end_us")
            - F.greatest("session_start_us", "hr_start_us")
            + 1
        ).alias("overlap_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_median_inter_event_gap",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS gap
      FROM events
    ), gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
    r AS (
      SELECT user_id, gap,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM gg
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END)
            + MAX(CASE WHEN rn = n // 2 + 1 THEN gap END)) / 2.0
             AS median_gap_us
    FROM r GROUP BY user_id
    """,
)
def events_median_inter_event_gap(spark: SparkSession, sf: str):
    """EXACT median inter-event gap per user (the burstiness profile):
    LAG over each user's event sequence -> the two-middle-rows median on
    the gap distribution (rank positions (n+1) div 2 and n div 2 + 1 —
    the same integer-rank discipline as median_price_by_priority; the
    value at a rank is well-defined under gap ordering even with tied
    gaps, and the even-count average is one exact-integer sum / 2.0).
    Both windows and the rollup share one user_id shuffle."""
    ev = _ev(spark, sf)
    wseq = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = ev.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(wseq)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    wr = W.partitionBy("user_id").orderBy("gap")
    wn = W.partitionBy("user_id")
    r = g.select(
        "user_id", "gap",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo = F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap")))
    hi = F.max(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("gap")))
    return r.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_gaps"),
        ((lo + hi) / F.lit(2.0)).alias("median_gap_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_user_rfm",
    """
    WITH per AS (
      SELECT user_id,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS monetary_cents,
             MAX(epoch_us(ts)) AS last_ts_us
      FROM events GROUP BY user_id
    ), g AS (SELECT MAX(last_ts_us) AS global_max FROM per)
    SELECT p.user_id,
           g.global_max - p.last_ts_us AS recency_us,
           p.frequency, p.monetary_cents,
           CAST(NTILE(5) OVER (ORDER BY g.global_max - p.last_ts_us DESC,
                               p.user_id) AS INT) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY p.frequency, p.user_id) AS INT)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY p.monetary_cents, p.user_id) AS INT)
             AS m_score
    FROM per p CROSS JOIN g
    """,
)
def events_user_rfm(spark: SparkSession, sf: str):
    """RFM SEGMENTATION (recency / frequency / monetary) — the classic
    user-scoring shape: per-user rollup, recency vs the corpus max
    timestamp (single-row broadcast cross join), and 1-5 quintile scores
    per dimension via NTILE with a unique tie-break (5 = best on every
    axis).  All inputs integer (µs, cents).  Scale note: the NTILE
    windows here run over the POST-AGGREGATION per-user rows; at
    hundreds of millions of users the global window becomes the
    single-partition hazard and the deployment form derives the same
    scores from broadcast quantile cutoffs (the
    ``stratified_sample_balanced`` threshold discipline) — this query
    pins the semantics those cutoffs must reproduce."""
    ev = _ev(spark, sf)
    per = ev.groupBy("user_id").agg(
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
        F.max("ts_us").alias("last_ts_us"),
    )
    g = per.agg(F.max("last_ts_us").alias("global_max"))
    p = per.crossJoin(F.broadcast(g)).withColumn(
        "recency_us", F.col("global_max") - F.col("last_ts_us")
    )
    r = F.ntile(5).over(W.orderBy(F.desc("recency_us"), "user_id"))
    f = F.ntile(5).over(W.orderBy("frequency", "user_id"))
    m = F.ntile(5).over(W.orderBy("monetary_cents", "user_id"))
    return p.select(
        "user_id", "recency_us", "frequency", "monetary_cents",
        r.cast("int").alias("r_score"),
        f.cast("int").alias("f_score"),
        m.cast("int").alias("m_score"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_hourly_anomaly_zscore",
    f"""
    WITH h AS (
      SELECT event_type, epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(c) AS BIGINT) AS sum_c,
             CAST(SUM(c * c) AS BIGINT) AS sum_c2
      FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hour_bucket, h.c,
           CASE WHEN s.n >= 2
                 AND CAST(s.n AS DOUBLE) * s.sum_c2
                       - CAST(s.sum_c AS DOUBLE) * s.sum_c > 0 THEN
             (CAST(h.c AS DOUBLE) - CAST(s.sum_c AS DOUBLE) / s.n)
               / sqrt((CAST(s.n AS DOUBLE) * s.sum_c2
                         - CAST(s.sum_c AS DOUBLE) * s.sum_c)
                      / (CAST(s.n AS DOUBLE) * (s.n - 1)))
           END AS zscore
    FROM h JOIN s ON s.event_type = h.event_type
    WHERE CASE WHEN s.n >= 2
                AND CAST(s.n AS DOUBLE) * s.sum_c2
                      - CAST(s.sum_c AS DOUBLE) * s.sum_c > 0 THEN
            (CAST(h.c AS DOUBLE) - CAST(s.sum_c AS DOUBLE) / s.n)
              / sqrt((CAST(s.n AS DOUBLE) * s.sum_c2
                        - CAST(s.sum_c AS DOUBLE) * s.sum_c)
                     / (CAST(s.n AS DOUBLE) * (s.n - 1)))
          END >= CAST(2.5 AS DOUBLE)
    """,
)
def events_hourly_anomaly_zscore(spark: SparkSession, sf: str):
    """ANOMALY DETECTION with engine-exact statistics: hours whose event
    count sits >= 2.5 sample standard deviations above that event type's
    hourly mean.  No stddev aggregate anywhere — built-in stddev
    accumulates in partition order (non-deterministic last-ulp): instead
    mean and variance derive from EXACT integer sums
    (n, Σc, Σc² — sum-of-squares identity), and the z-score is a fixed
    sequence of IEEE ops on those integers, bit-identical cross-engine,
    so even the >= threshold row set matches exactly.  Degenerate types
    (one active hour -> (n-1) = 0; perfectly uniform hourly counts ->
    variance 0) produce NULL z via a CONDITIONALLY EVALUATED CASE
    instead of crashing ANSI Spark — the guard must live INSIDE the
    expression, not as a flat AND in the filter, because vectorized
    evaluation does not short-circuit (round-10 division-loudness
    rule).  Scale: one (type, hour) groupBy + one tiny per-type rollup
    broadcast back."""
    ev = _ev(spark, sf)
    h = ev.groupBy(
        "event_type", F.expr(f"ts_us DIV {US_PER_HOUR}").alias("hour_bucket")
    ).agg(F.count("*").alias("c"))
    s = h.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").cast("long").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    j = h.join(F.broadcast(s), "event_type")
    mean = F.col("sum_c").cast("double") / F.col("n")
    var_num = (
        F.col("n").cast("double") * F.col("sum_c2")
        - F.col("sum_c").cast("double") * F.col("sum_c")
    )
    var = var_num / (F.col("n").cast("double") * (F.col("n") - 1))
    z = F.when(
        (F.col("n") >= 2) & (var_num > 0),
        (F.col("c").cast("double") - mean) / F.sqrt(var),
    )
    return (
        j.withColumn("zscore", z)
        .filter(F.col("zscore") >= F.lit(2.5))
        .select("event_type", "hour_bucket", "c", "zscore")
    )


# ---------------------------------------------------------------------------
@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)
             AS transition_prob
    FROM trans
    """,
)
def events_markov_transitions(spark: SparkSession, sf: str):
    """BEHAVIORAL bigram model: the event-type transition matrix over
    each user's time-ordered event sequence (LAG per user, unique
    (ts, event_id) tie-break) with row-normalized transition
    probabilities — the first-order Markov model every funnel/session
    analysis starts from.  Counts are exact integers; each probability
    is one division.  Scale: the LAG shares the user_id shuffle, the
    matrix is |types|² rows, and the normalizing window runs over that
    tiny matrix."""
    ev = _ev(spark, sf)
    wseq = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(wseq).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    wnorm = W.partitionBy("prev_type")
    return trans.select(
        "prev_type", "next_type", "n",
        (F.col("n").cast("double") / F.sum("n").over(wnorm)).alias("transition_prob"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_top_3step_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type, 1) OVER w AS p1,
             LAG(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), paths AS (
      SELECT p2 || '>' || p1 || '>' || event_type AS path
      FROM seq WHERE p2 IS NOT NULL
    )
    SELECT path, COUNT(*) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def events_top_3step_paths(spark: SparkSession, sf: str):
    """SEQUENCE MINING: the 10 most common 3-event behavior paths across
    all users (double LAG over each user's time-ordered stream, unique
    tie-break, then a corpus-wide trigram count with deterministic
    (count, path) top-k).  The windows share one user_id shuffle; the
    trigram rollup shuffles on the path string; the top-10 plans as
    TakeOrdered — no global sort materializes."""
    ev = _ev(spark, sf)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "p2", "p1", "event_type").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@register(
    "events_weekday_profile",
    f"""
    SELECT CAST(((epoch_us(ts) // {24 * US_PER_HOUR}) + 4) % 7 AS INT)
             AS day_of_week,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_weekday_profile(spark: SparkSession, sf: str):
    """Day-of-week activity profile with CALENDAR-FREE integer
    arithmetic: dow = (epoch_day + 4) mod 7 (1970-01-01 was a Thursday;
    0 = Monday) — no date functions, no locale/week-start ambiguity, no
    timezone anywhere.  One single-shuffle groupBy on an 7 x |types|
    key space."""
    ev = _ev(spark, sf)
    dow = ((F.expr(f"ts_us DIV {24 * US_PER_HOUR}") + 4) % 7).cast("int")
    return ev.groupBy(dow.alias("day_of_week"), "event_type").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_value_boxplot_by_type",
    """
    WITH v AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
      FROM events
    ), r AS (
      SELECT event_type, vc,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY vc, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           MIN(vc) / 100.0 AS min_value,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN vc END) / 100.0 AS q1,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN vc END)
            + MAX(CASE WHEN rn = n // 2 + 1 THEN vc END)) / 200.0 AS median,
           MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN vc END) / 100.0 AS q3,
           MAX(vc) / 100.0 AS max_value
    FROM r GROUP BY event_type
    """,
)
def events_value_boxplot_by_type(spark: SparkSession, sf: str):
    """EXACT five-number summary (box plot) of event values per type:
    min / Q1 / median / Q3 / max via integer-cent rank selection (ceil
    ranks for the quartiles, two-middle-rows median) — no interpolation,
    no approx_percentile, every statistic an actual stored value or an
    exact two-integer average.  Two windows + the rollup share one
    event_type shuffle."""
    ev = _ev(spark, sf)
    v = ev.select(
        "event_type", "event_id", F.round(F.col("value") * 100, 0).cast("long").alias("vc")
    )
    wr = W.partitionBy("event_type").orderBy("vc", "event_id")
    wn = W.partitionBy("event_type")
    r = v.select(
        "event_type", "vc",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    at = lambda expr: F.max(F.when(F.col("rn") == F.expr(expr), F.col("vc")))
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        (F.min("vc") / F.lit(100.0)).alias("min_value"),
        (at("(n + 3) div 4") / F.lit(100.0)).alias("q1"),
        ((at("(n + 1) div 2") + at("n div 2 + 1")) / F.lit(200.0)).alias("median"),
        (at("(3 * n + 1) div 4") / F.lit(100.0)).alias("q3"),
        (F.max("vc") / F.lit(100.0)).alias("max_value"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_first_touch_attribution",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    cand AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
             e.event_id AS touch_id, e.event_type AS touch_type,
             e.ts_us AS touch_ts_us,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts_us, e.event_id) AS rn
      FROM p JOIN e
        ON e.user_id = p.user_id
       AND e.ts_us >= p.ts_us - {24 * US_PER_HOUR}
       AND e.ts_us < p.ts_us
    )
    SELECT purchase_id, user_id, purchase_ts_us,
           touch_id AS first_touch_id,
           touch_type AS first_touch_type,
           touch_ts_us AS first_touch_ts_us
    FROM cand WHERE rn = 1
    """,
)
def events_first_touch_attribution(spark: SparkSession, sf: str):
    """FIRST-TOUCH ATTRIBUTION: each purchase credited to the EARLIEST
    event of any type in the preceding 24h for that user.  The Spark
    plan is the scale form no join can match: a RANGE-framed window
    (rangeBetween(-24h, -1) over each user's event-time axis) carrying a
    struct-ARGMIN — min of (ts, event_id, type) structs is the earliest
    event by lexicographic struct ordering — so attribution costs ONE
    user_id shuffle with bounded frames, while the oracle spells the
    same semantics as the quadratic-in-window range join + rank.  Ties
    impossible (event_id unique in the struct key)."""
    ev = _ev(spark, sf)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-24 * US_PER_HOUR, -1)
    )
    first = F.min(F.struct("ts_us", "event_id", "event_type")).over(w)
    attributed = ev.withColumn("_ft", first).filter(
        (F.col("event_type") == "purchase") & F.col("_ft").isNotNull()
    )
    return attributed.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("_ft.event_id").alias("first_touch_id"),
        F.col("_ft.event_type").alias("first_touch_type"),
        F.col("_ft.ts_us").alias("first_touch_ts_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_scd2_value_band",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN value < 5 THEN 'low'
                  WHEN value < 15 THEN 'mid' ELSE 'high' END AS band
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN band = LAG(band)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     THEN 0 ELSE 1 END AS chg
      FROM e
    ), runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), hist AS (
      SELECT user_id, run_id, MIN(band) AS band,
             MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS version, band, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to_us,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(CASE WHEN LEAD(valid_from_us)
                       OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM hist
    """,
)
def events_scd2_value_band(spark: SparkSession, sf: str):
    """SCD TYPE-2 HISTORY RECONSTRUCTION from a changelog — the
    warehouse-standard shape: each user's value-band attribute compressed
    into change runs (consecutive same-band events collapse), each run a
    versioned validity interval ``[valid_from, valid_to)`` with the open
    current row flagged.  Now delegates to the parameterized operators
    (operators/scd.py): ``band_label`` with the original (5, 15)
    thresholds as defaults — deployments tune the band edges without
    touching the history logic — and ``scd2_history`` for the
    gaps-and-islands compression (scale notes there: ONE shuffle key end
    to end, no self-join reconstruction)."""
    from byte_convert_avro_spark.operators.scd import band_label, scd2_history

    ev = _ev(spark, sf).select(
        "user_id", "event_id", "ts_us", band_label("value").alias("band")
    )
    hist = scd2_history(ev, "user_id", "band", "ts_us", "event_id")
    return hist.select(
        "user_id",
        "version",
        "band",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "n_events",
        "is_current",
    )


# ---------------------------------------------------------------------------
@register(
    "events_changelog_compaction",
    """
    WITH ranked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_versions
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, ts_us AS last_ts_us,
           event_type AS last_type, value AS last_value,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM ranked WHERE rn = 1
    """,
)
def events_changelog_compaction(spark: SparkSession, sf: str):
    """CDC CHANGELOG COMPACTION — the upsert-materialization primitive
    (Kafka log compaction / MERGE latest-wins): each key's newest record
    wins, ties broken by event_id.  The Spark plan is the scale form: a
    single groupBy with a struct-ARGMAX (max of (ts, event_id, payload)
    structs) — partial-aggregates map-side and never sorts whole
    partitions, where the window ROW_NUMBER form the oracle spells (and
    naive implementations run) must sort every key group.  ONE shuffle
    on the key, no window state."""
    ev = _ev(spark, sf)
    top = F.max(
        F.struct("ts_us", "event_id", "event_type", "value")
    ).alias("_last")
    return (
        ev.groupBy("user_id")
        .agg(top, F.count("*").cast("long").alias("n_versions"))
        .select(
            "user_id",
            F.col("_last.event_id").alias("last_event_id"),
            F.col("_last.ts_us").alias("last_ts_us"),
            F.col("_last.event_type").alias("last_type"),
            F.col("_last.value").alias("last_value"),
            "n_versions",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_incremental_agg_merge",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_value_e2,
           MIN(epoch_us(ts)) AS first_ts_us,
           MAX(epoch_us(ts)) AS last_ts_us
    FROM events GROUP BY user_id
    """,
)
def events_incremental_agg_merge(spark: SparkSession, sf: str):
    """INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view update
    discipline a 100 TB warehouse runs nightly: per-user state
    (count / exact-cent sum / min / max) is computed SEPARATELY over the
    historical partition and the new-arrivals partition, then MERGED
    state-to-state (counts add, sums add, mins min, maxes max) without
    ever rescanning history.  The oracle computes the same aggregate
    from scratch over everything — equality IS the proof that the merge
    functions are the aggregate's associative halves (the property that
    makes map-side partials, AQE re-partitioning, and incremental view
    maintenance all correct).  Cutoff: first 20 integer days; both
    slices and the merge share the user_id shuffle key."""
    ev = _ev(spark, sf).select(
        "user_id",
        "ts_us",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
        (F.col("ts_us") < 20 * 24 * US_PER_HOUR + F.lit(1704067200000000)).alias(
            "_is_hist"
        ),
    )

    def state(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum("v2").alias("total_value_e2"),
            F.min("ts_us").alias("first_ts_us"),
            F.max("ts_us").alias("last_ts_us"),
        )

    hist = state(ev.filter(F.col("_is_hist")))
    delta = state(ev.filter(~F.col("_is_hist")))
    merged = hist.unionAll(delta).groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("total_value_e2").cast("long").alias("total_value_e2"),
        F.min("first_ts_us").alias("first_ts_us"),
        F.max("last_ts_us").alias("last_ts_us"),
    )
    return merged


# ---------------------------------------------------------------------------
@register(
    "events_pointintime_band_join",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN value < 5 THEN 'low'
                  WHEN value < 15 THEN 'mid' ELSE 'high' END AS band
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN band = LAG(band)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     THEN 0 ELSE 1 END AS chg
      FROM e
    ), runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), hist AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS version, MIN(band) AS band,
             MIN(ts_us) AS valid_from_us
      FROM runs GROUP BY user_id, run_id
    ), purch AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ), pick AS (
      SELECT p.user_id, p.event_id, p.ts_us, h.version, h.band,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY h.valid_from_us DESC, h.version DESC)
               AS rn
      FROM purch p
      JOIN hist h ON h.user_id = p.user_id AND h.valid_from_us <= p.ts_us
    )
    SELECT user_id, event_id AS purchase_id, ts_us,
           version AS band_version, band AS band_at_purchase
    FROM pick WHERE rn = 1
    """,
)
def events_pointintime_band_join(spark: SparkSession, sf: str):
    """POINT-IN-TIME-CORRECT FEATURE JOIN — the ML-training leakage
    guard: each purchase is joined to the value-band VERSION that was
    valid AT THAT MOMENT (the SCD2 history from
    ``events_scd2_value_band``), never a later one — the lookup a
    feature store must get right or training sees the future.  The
    Spark plan is the as-of union-sort form (operators/asof.py): ONE
    user_id shuffle, no interval join — where the oracle spells the
    quadratic validity-range join + rank.  Every purchase matches (its
    own event opens or extends a version at ts)."""
    versions = events_scd2_value_band(spark, sf).select(
        "user_id",
        F.col("valid_from_us").alias("ts_us"),
        "version",
        "band",
    )
    purch = _ev(spark, sf).filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts_us"
    )
    from byte_convert_avro_spark.operators.asof import asof_join

    j = asof_join(purch, versions, on="ts_us", by="user_id",
                  right_cols=["version", "band"])
    return j.select(
        "user_id",
        "purchase_id",
        "ts_us",
        F.col("version_asof").alias("band_version"),
        F.col("band_asof").alias("band_at_purchase"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_value_mad_outliers",
    """
    WITH v AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v2
      FROM events
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v2, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ), med AS (
      SELECT event_type, CAST(SUM(v2) AS BIGINT) AS med2, MAX(n) AS n
      FROM ranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY event_type
    ), dev AS (
      SELECT v.event_id, v.event_type, ABS(2 * v.v2 - m.med2) AS d2
      FROM v JOIN med m ON m.event_type = v.event_type
    ), dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d2, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type, CAST(SUM(d2) AS BIGINT) AS mad2
      FROM dranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           m.med2 / 200.0 AS median_value,
           a.mad2 / 400.0 AS mad_value,
           CAST(SUM(CASE WHEN 2 * d.d2 > 3 * a.mad2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM med m
    JOIN mad a ON a.event_type = m.event_type
    JOIN dev d ON d.event_type = m.event_type
    GROUP BY m.event_type, m.n, m.med2, a.mad2
    """,
)
def events_value_mad_outliers(spark: SparkSession, sf: str):
    """ROBUST OUTLIER DETECTION (median / MAD — the robust z-score):
    per event type, the exact median and median-absolute-deviation via
    the two-middle-rows selection, then the count of values farther than
    3 MADs — the outlier rule that, unlike mean/sigma, cannot be dragged
    by the outliers themselves.  ALL comparisons are integer (doubled
    cent units: 2·d2 > 3·mad2), both halves exact-selection rather than
    any engine quantile function, so every number hash-matches.  Scale:
    three shuffles, all on the low-cardinality event_type key, windows
    row-ranked; the deviation join broadcasts the tiny per-type medians."""
    v = _ev(spark, sf).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
    )
    wt = W.partitionBy("event_type")

    def two_middle(df, col, out):
        ranked = df.select(
            "event_type",
            col,
            F.row_number().over(wt.orderBy(col, "event_id")).alias("rn"),
            F.count("*").over(wt).alias("n"),
        )
        return (
            ranked.filter(
                (F.col("rn") == F.floor((F.col("n") + 1) / 2))
                | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
            )
            .groupBy("event_type")
            .agg(F.sum(col).cast("long").alias(out), F.max("n").alias("n"))
        )

    med = two_middle(v, "v2", "med2")
    dev = v.join(F.broadcast(med.select("event_type", "med2")), "event_type").select(
        "event_id",
        "event_type",
        F.abs(2 * F.col("v2") - F.col("med2")).alias("d2"),
    )
    mad = two_middle(dev, "d2", "mad2").select("event_type", "mad2")
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med2", "mad2")
        .agg(
            F.sum((2 * F.col("d2") > 3 * F.col("mad2")).cast("int"))
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            (F.col("med2") / 200.0).alias("median_value"),
            (F.col("mad2") / 400.0).alias("mad_value"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_time_weighted_value",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v2
      FROM events
    ), gaps AS (
      SELECT user_id, v2,
             (LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
              - ts_us) // 1000000 AS gap_s
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(gap_s) AS BIGINT) AS n_intervals,
           CAST(SUM(gap_s) AS BIGINT) AS observed_s,
           CASE WHEN SUM(gap_s) > 0
                THEN CAST(SUM(v2 * gap_s) AS DOUBLE) / SUM(gap_s) / 100.0
                ELSE NULL END AS twap_value
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted_value(spark: SparkSession, sf: str):
    """TIME-WEIGHTED AVERAGE (TWAP) — the metric/financial primitive a
    plain AVG gets wrong when observations are irregular: each value is
    weighted by how LONG it was in effect (gap to the next event,
    step-function semantics; the open last interval is excluded).
    Exact-integer discipline end to end: cent values × whole-second
    durations keep every product far inside int64 (µs durations would
    flirt with overflow at month-long gaps), ONE final division.
    Scale: a LEAD window and the rollup share one user_id shuffle."""
    ev = _ev(spark, sf).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
    )
    wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id",
        "v2",
        ((F.lead("ts_us").over(wo) - F.col("ts_us")) / 1_000_000)
        .cast("long")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").cast("long").alias("n_intervals"),
        F.sum("gap_s").cast("long").alias("observed_s"),
        F.when(
            F.sum("gap_s") > 0,
            F.sum(F.col("v2") * F.col("gap_s")).cast("double")
            / F.sum("gap_s")
            / 100.0,
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("twap_value"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_session_bounce_rate",
    """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    > 1800000000
                    OR LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_idx,
             MIN(ts_us) // 86400000000 AS start_day,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_idx
    )
    SELECT start_day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM sessions GROUP BY start_day
    """,
)
def events_session_bounce_rate(spark: SparkSession, sf: str):
    """BOUNCE RATE per day — the engagement KPI over sessionized events:
    share of 30-min-gap sessions containing exactly one event, keyed by
    the session's start day.  Composes the gaps-and-islands session
    build (one user_id shuffle, the same shape the streaming
    session_window query equals) with a day rollup; the rate is one
    exact-int division."""
    ev = _ev(spark, sf)
    wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_us",
        (
            (F.col("ts_us") - F.lag("ts_us").over(wo) > 1_800_000_000)
            | F.lag("ts_us").over(wo).isNull()
        )
        .cast("int")
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts_us").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    sessions = numbered.groupBy("user_id", "session_idx").agg(
        F.expr("min(ts_us) DIV 86400000000").alias("start_day"),
        F.count("*").alias("n_events"),
    )
    return sessions.groupBy("start_day").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).cast("long").alias("n_bounces"),
        (
            F.sum((F.col("n_events") == 1).cast("int")).cast("double") / F.count("*")
        ).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
@register(
    "ab_test_purchase_rates",
    """
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM events
    ), conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), arms AS (
      SELECT a.arm,
             COUNT(*) AS n_users,
             SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_converted
      FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
      GROUP BY a.arm
    ), wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n_users END) AS na,
        MAX(CASE WHEN arm = 'A' THEN n_converted END) AS xa,
        MAX(CASE WHEN arm = 'B' THEN n_users END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN n_converted END) AS xb
      FROM arms
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(xa AS BIGINT) AS x_a,
           CAST(nb AS BIGINT) AS n_b, CAST(xb AS BIGINT) AS x_b,
           CAST(xa AS DOUBLE) / na AS rate_a,
           CAST(xb AS DOUBLE) / nb AS rate_b,
           CASE WHEN xa + xb = 0 OR xa + xb = na + nb THEN NULL
                ELSE (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                     / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
           END AS z_stat
    FROM wide
    """,
)
def ab_test_purchase_rates(spark: SparkSession, sf: str):
    """A/B-TEST READOUT: users hash-split into two arms (the
    content-stable assignment an experimentation platform uses), per-arm
    purchase conversion, and the two-proportion pooled z statistic —
    every count exact, the z formula one chain of IEEE-correctly-rounded
    ops on exact-int-derived doubles, so even the test statistic
    hash-matches.  Scale: one distinct per side co-keyed on user_id,
    a 2-row pivot, scalar math."""
    ev = t(spark, sf, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(hash_bucket("user_id", 2) == 0, "A").otherwise("B").alias("arm"),
        )
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
        .withColumn("_c", F.lit(1))
    )
    arms = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce("_c", F.lit(0))).alias("n_converted"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("xa"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("xb"),
    )
    pa = F.col("xa").cast("double") / F.col("na")
    pb = F.col("xb").cast("double") / F.col("nb")
    pool = (F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb"))
    # pool in {0, 1} (nobody / everybody converted) makes the pooled
    # variance 0 — the z statistic is undefined, not infinite
    z = F.when(
        (F.col("xa") + F.col("xb") == 0)
        | (F.col("xa") + F.col("xb") == F.col("na") + F.col("nb")),
        F.lit(None).cast("double"),
    ).otherwise(
        (pa - pb)
        / F.sqrt(
            pool * (1 - pool)
            * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
        )
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("xa").cast("long").alias("x_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("xb").cast("long").alias("x_b"),
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_max_drawdown_per_user",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v2
      FROM events
    ), run AS (
      SELECT user_id, event_id, v2,
             MAX(v2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS peak2
      FROM e
    )
    SELECT user_id,
           CAST(MAX(peak2 - v2) AS BIGINT) AS max_drawdown_e2,
           CAST(MAX(peak2) AS BIGINT) AS peak_e2,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM run GROUP BY user_id
    """,
)
def events_max_drawdown_per_user(spark: SparkSession, sf: str):
    """MAX DRAWDOWN — the peak-to-trough analytic (finance/SLO burn):
    per user, the largest drop of the value series below its running
    peak.  One running-max window + one rollup, both on the user_id
    key; everything exact integer cents, no float accumulation.  The
    naive formulation joins each row against all its predecessors —
    O(n²) per user; the running-max frame is the linear form."""
    ev = _ev(spark, sf).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
    )
    wo = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = ev.select(
        "user_id", "v2", F.max("v2").over(wo).alias("peak2")
    )
    return run.groupBy("user_id").agg(
        F.max(F.col("peak2") - F.col("v2")).cast("long").alias("max_drawdown_e2"),
        F.max("peak2").cast("long").alias("peak_e2"),
        F.count("*").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_groupwise_scaled_pandas",
    """
    WITH e AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v2
      FROM events
    ), stats AS (
      SELECT event_type, MIN(v2) AS mn, MAX(v2) AS mx FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN s.mx = s.mn THEN 0.0
                ELSE CAST(e.v2 - s.mn AS DOUBLE) / (s.mx - s.mn) END AS scaled
    FROM e JOIN stats s ON s.event_type = e.event_type
    """,
)
def events_groupwise_scaled_pandas(spark: SparkSession, sf: str):
    """GROUPED applyInPandas under the oracle gate — the cogroup/pandas
    API surface exercised by a real feature transform: per event type,
    min-max scale the (exact-cent) values inside an Arrow-batched pandas
    function, where the whole group is visible at once (the shape
    sklearn-style per-group fitting needs; a pure-column rewrite exists
    for THIS transform — the oracle spells it — but group-local fitting
    in general does not).  Integer cents in, one IEEE division out, so
    pandas/numpy and the SQL engines agree bitwise.  Scale: one shuffle
    on the group key; each group must fit a worker's memory — for
    heavy-tailed groups prefer the broadcast-stats column form the
    oracle shows."""
    import pandas as pd

    ev = _ev(spark, sf).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn = int(pdf["v2"].min())
        mx = int(pdf["v2"].max())
        if mx == mn:
            scaled = [0.0] * len(pdf)
        else:
            rng = float(mx - mn)
            scaled = [float(int(v) - mn) / rng for v in pdf["v2"]]
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "scaled": scaled,
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        scale, schema="event_id long, event_type string, scaled double"
    )


# ---------------------------------------------------------------------------
@register(
    "events_user_survival_curve",
    """
    WITH life AS (
      SELECT user_id,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000 AS lifespan_d
      FROM events GROUP BY user_id
    ), n AS (SELECT COUNT(*) AS n_users FROM life),
    days AS (SELECT unnest(generate_series(0, 30)) AS d)
    SELECT days.d AS day_offset,
           CAST(SUM(CASE WHEN life.lifespan_d >= days.d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN life.lifespan_d >= days.d THEN 1 ELSE 0 END)
                AS DOUBLE) / MAX(n.n_users) AS survival
    FROM days CROSS JOIN life CROSS JOIN n
    GROUP BY days.d
    """,
)
def events_user_survival_curve(spark: SparkSession, sf: str):
    """SURVIVAL CURVE (the retention analyst's Kaplan-Meier shape for
    fully-observed lifespans): S(d) = fraction of users whose observed
    activity span reaches at least d days, for d in 0..30.  Lifespans
    reduce each user to ONE integer first; the curve is a 31-row
    broadcast cross join over that tiny table — never a per-event scan
    per offset; the share is one exact-int division.  Censoring-aware
    KM estimation drops in by replacing the numerator rule."""
    ev = _ev(spark, sf)
    life = ev.groupBy("user_id").agg(
        F.expr("(max(ts_us) - min(ts_us)) DIV 86400000000").alias("lifespan_d")
    )
    n = life.agg(F.count("*").alias("n_users"))
    days = spark.range(0, 31).select(F.col("id").alias("d"))
    joined = days.crossJoin(life).crossJoin(F.broadcast(n))
    return joined.groupBy("d").agg(
        F.sum((F.col("lifespan_d") >= F.col("d")).cast("int"))
        .cast("long")
        .alias("n_surviving"),
        (
            F.sum((F.col("lifespan_d") >= F.col("d")).cast("int")).cast("double")
            / F.max("n_users")
        ).alias("survival"),
    ).select(F.col("d").alias("day_offset"), "n_surviving", "survival")


# ---------------------------------------------------------------------------
@register(
    "events_growth_accounting_daily",
    """
    WITH e AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_idx
      FROM events
    ), first_day AS (
      SELECT user_id, MIN(day_idx) AS d0 FROM e GROUP BY user_id
    )
    SELECT e.day_idx,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN e.day_idx = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN e.day_idx > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM e JOIN first_day f ON f.user_id = e.user_id
    GROUP BY e.day_idx
    """,
)
def events_growth_accounting_daily(spark: SparkSession, sf: str):
    """GROWTH ACCOUNTING: each day's active users split into NEW (first
    day ever) vs RETURNING — the decomposition every growth dashboard
    leads with.  Distinct (user, day) pairs first (the heavy reduction),
    then first-day per user, then one co-keyed join + day rollup — all
    three shuffles on user_id/day keys, no window needed."""
    ev = _ev(spark, sf)
    e = ev.select(
        "user_id", F.expr("ts_us DIV 86400000000").alias("day_idx")
    ).distinct()
    first_day = e.groupBy("user_id").agg(F.min("day_idx").alias("d0"))
    return (
        e.join(first_day, "user_id")
        .groupBy("day_idx")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum((F.col("day_idx") == F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("day_idx") > F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_returning"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_freshness_lag",
    """
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS global_max FROM events)
    SELECT event_type,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS latest_ts_us,
           CAST(mx.global_max - MAX(epoch_us(ts)) AS BIGINT) AS lag_us,
           CAST((mx.global_max - MAX(epoch_us(ts))) // 1000000 AS BIGINT)
             AS lag_s
    FROM events CROSS JOIN mx
    GROUP BY event_type, mx.global_max
    """,
)
def events_freshness_lag(spark: SparkSession, sf: str):
    """DATA-FRESHNESS MONITORING: how far each event type's newest
    record trails the newest record overall — the lag metric a pipeline
    SLO alert fires on (a type whose lag grows is a stuck producer).
    One scan: per-type max and the broadcast global max; integer µs."""
    ev = _ev(spark, sf)
    mx = ev.agg(F.max("ts_us").alias("global_max"))
    return (
        ev.groupBy("event_type")
        .agg(F.max("ts_us").alias("latest_ts_us"))
        .crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.col("latest_ts_us").cast("long").alias("latest_ts_us"),
            (F.col("global_max") - F.col("latest_ts_us")).cast("long").alias("lag_us"),
            F.expr("(global_max - latest_ts_us) DIV 1000000").alias("lag_s"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_seasonal_residual_anomalies",
    """
    WITH e AS (
      SELECT event_id,
             ((epoch_us(ts) // 3600000000) % 168) AS how,
             (epoch_us(ts) // 3600000000) AS hour_idx
      FROM events
    ), hourly AS (
      SELECT hour_idx, MAX(how) AS how, COUNT(*) AS n
      FROM e GROUP BY hour_idx
    ), ranked AS (
      SELECT how, n,
             ROW_NUMBER() OVER (PARTITION BY how ORDER BY n, hour_idx) AS rn,
             COUNT(*) OVER (PARTITION BY how) AS cnt
      FROM hourly
    ), baseline AS (
      SELECT how, CAST(SUM(n) AS BIGINT) AS med2
      FROM ranked
      WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      GROUP BY how
    )
    SELECT h.hour_idx, h.how,
           CAST(h.n AS BIGINT) AS n_events,
           b.med2 / 2.0 AS baseline_median,
           CAST(CASE WHEN 2 * h.n > 3 * b.med2 OR 2 * h.n * 3 < b.med2
                THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM hourly h JOIN baseline b ON b.how = h.how
    """,
)
def events_seasonal_residual_anomalies(spark: SparkSession, sf: str):
    """SEASONAL-BASELINE ANOMALIES: each hour's event volume compared to
    the exact MEDIAN of the SAME hour-of-week across the history — the
    deseasonalized check that flags a quiet 3am spike a global threshold
    misses.  Flag = outside the symmetric 3x band [baseline/3,
    3x baseline] (with med2 = 2*median: anomalous iff 2n > 3*med2 or
    6n < med2), tested as pure integer cross-products of exact counts
    against the two-middle-rows median (no float thresholds anywhere).  Scale: hourly rollup first
    (the big reduction), then windows over the tiny (168-slot, weeks)
    table."""
    ev = _ev(spark, sf)
    e = ev.select(
        F.expr("(ts_us DIV 3600000000) % 168").alias("how"),
        F.expr("ts_us DIV 3600000000").alias("hour_idx"),
    )
    hourly = e.groupBy("hour_idx").agg(
        F.max("how").alias("how"), F.count("*").alias("n")
    )
    wh = W.partitionBy("how")
    ranked = hourly.select(
        "how",
        "n",
        F.row_number().over(wh.orderBy("n", "hour_idx")).alias("rn"),
        F.count("*").over(wh).alias("cnt"),
    )
    baseline = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
        )
        .groupBy("how")
        .agg(F.sum("n").cast("long").alias("med2"))
    )
    return hourly.join(F.broadcast(baseline), "how").select(
        "hour_idx",
        "how",
        F.col("n").cast("long").alias("n_events"),
        (F.col("med2") / 2.0).alias("baseline_median"),
        (
            (2 * F.col("n") > 3 * F.col("med2"))
            | (2 * F.col("n") * 3 < F.col("med2"))
        )
        .cast("int")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_last_touch_attribution",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    cand AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
             e.event_id AS touch_id, e.event_type AS touch_type,
             e.ts_us AS touch_ts_us,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts_us DESC, e.event_id DESC) AS rn
      FROM p JOIN e
        ON e.user_id = p.user_id
       AND e.ts_us >= p.ts_us - {24 * US_PER_HOUR}
       AND e.ts_us < p.ts_us
    )
    SELECT purchase_id, user_id, purchase_ts_us,
           touch_id AS last_touch_id,
           touch_type AS last_touch_type,
           touch_ts_us AS last_touch_ts_us
    FROM cand WHERE rn = 1
    """,
)
def events_last_touch_attribution(spark: SparkSession, sf: str):
    """LAST-TOUCH ATTRIBUTION — the other canonical credit model: each
    purchase credited to the LATEST preceding event in the 24h window
    (first-touch's mirror; running both and diffing the credit tables
    is how attribution-model sensitivity is measured).  Same scale form:
    one RANGE-framed window carrying a struct-ARGMAX, one user_id
    shuffle, vs the oracle's quadratic range join + rank."""
    ev = _ev(spark, sf)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-24 * US_PER_HOUR, -1)
    )
    last = F.max(F.struct("ts_us", "event_id", "event_type")).over(w)
    attributed = ev.withColumn("_lt", last).filter(
        (F.col("event_type") == "purchase") & F.col("_lt").isNotNull()
    )
    return attributed.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("_lt.event_id").alias("last_touch_id"),
        F.col("_lt.event_type").alias("last_touch_type"),
        F.col("_lt.ts_us").alias("last_touch_ts_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_linear_attribution",
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_ts
      FROM events WHERE event_type IN ('view', 'click')
    ), pairs AS (
      SELECT p.purchase_id, t.event_type
      FROM p JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts <= p.p_ts
       AND p.p_ts - t.t_ts <= 604800000000
    ), pn AS (
      SELECT purchase_id, COUNT(*) AS n FROM pairs GROUP BY purchase_id
    ), shares AS (
      SELECT pr.purchase_id, pr.event_type,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(*) AS DOUBLE) / MAX(pn.n) AS share
      FROM pairs pr JOIN pn ON pn.purchase_id = pr.purchase_id
      GROUP BY pr.purchase_id, pr.event_type
    ), ch AS (
      SELECT event_type, purchase_id // 2048 AS chk,
             list_reduce(list(share ORDER BY purchase_id), (a, b) -> a + b) AS csum,
             COUNT(*) AS cnt, SUM(k) AS kc
      FROM shares GROUP BY event_type, chk
    )
    SELECT event_type,
           CAST(SUM(kc) AS BIGINT) AS n_touchpoints,
           CAST(SUM(cnt) AS BIGINT) AS n_purchases_touched,
           list_reduce(list(csum ORDER BY chk), (a, b) -> a + b) AS linear_credit
    FROM ch GROUP BY event_type
    """,
)
def events_linear_attribution(spark: SparkSession, sf: str):
    """LINEAR MULTI-TOUCH ATTRIBUTION — the third attribution model next
    to first-touch and last-touch: every view/click in the 7 days before
    a purchase shares that purchase's credit equally (k/n per channel),
    and channel credit sums the shares.  Each share is a division of
    exact integers (identical double on both engines) and the channel
    sum is the BOUNDED two-level purchase_id-ordered fold
    (functions.bounded_ordered_agg, chunk=2048 — a plain SUM of doubles
    would drift with accumulation order across engines/partitionings).
    Scale: the touch join keys on user_id with a 7-day event-time band;
    per-purchase counts and shares aggregate on the purchase key; the
    fold shuffles only (channel, chunk) partials."""
    from byte_convert_avro_spark.functions import bounded_ordered_agg

    ev = _ev(spark, sf)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    t_ = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", F.col("ts_us").alias("t_ts")
    )
    pairs = p.join(
        t_,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("p_ts") - F.col("t_ts") <= 604_800_000_000),
    ).select("purchase_id", "event_type")
    pn = pairs.groupBy("purchase_id").agg(F.count("*").alias("n"))
    shares = (
        pairs.groupBy("purchase_id", "event_type")
        .agg(F.count("*").alias("k"))
        .join(pn, "purchase_id")
        .select(
            "purchase_id",
            "event_type",
            "k",
            (F.col("k").cast("double") / F.col("n")).alias("share"),
        )
    )
    agg = bounded_ordered_agg(
        shares, ["event_type"], "purchase_id", "share", chunk=2048,
        chunk_aggs={"kc": F.sum("k")},
        final_aggs={"n_touchpoints": F.sum("kc")},
    )
    return agg.select(
        "event_type",
        F.col("n_touchpoints").cast("long").alias("n_touchpoints"),
        F.col("ocnt").alias("n_purchases_touched"),
        F.col("osum").alias("linear_credit"),
    )


# ---------------------------------------------------------------------------
@register(
    "user_conversion_latency",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ), firsts AS (
      SELECT user_id,
             MIN(ts_us) AS first_event_ts_us,
             MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
               AS first_purchase_ts_us
      FROM e GROUP BY user_id
    )
    SELECT f.user_id, f.first_event_ts_us, f.first_purchase_ts_us,
           f.first_purchase_ts_us - f.first_event_ts_us AS latency_us,
           CAST((SELECT COUNT(*) FROM e
                 WHERE e.user_id = f.user_id
                   AND e.ts_us < f.first_purchase_ts_us) AS BIGINT)
             AS n_events_before
    FROM firsts f
    WHERE f.first_purchase_ts_us IS NOT NULL
    """,
)
def user_conversion_latency(spark: SparkSession, sf: str):
    """CONVERSION LATENCY — per converting user, the integer-µs gap from
    their first event of any kind to their first purchase, plus how many
    events preceded it: the activation-funnel metric between the
    attribution models (which split credit) and the funnel counts (which
    lose the time axis).  The oracle spells the correlated count the way
    analysts write it; the Spark plan is the decorrelated form — the
    firsts aggregation and the before-count both key on user_id (one
    shuffle KEY end to end, where the correlated subquery would rescan
    events per user).  All integer µs, no floats anywhere."""
    ev = _ev(spark, sf)
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    firsts = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("first_event_ts_us"),
        F.min(purchase_ts).alias("first_purchase_ts_us"),
    )
    before = (
        ev.join(
            firsts.select("user_id", "first_purchase_ts_us"), "user_id"
        )
        .filter(F.col("ts_us") < F.col("first_purchase_ts_us"))
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events_before"))
    )
    return (
        firsts.filter(F.col("first_purchase_ts_us").isNotNull())
        .join(before, "user_id", "left")
        .select(
            "user_id",
            "first_event_ts_us",
            "first_purchase_ts_us",
            (
                F.col("first_purchase_ts_us") - F.col("first_event_ts_us")
            ).alias("latency_us"),
            F.coalesce("n_events_before", F.lit(0)).cast("long").alias(
                "n_events_before"
            ),
        )
    )
