"""Gate queries: event-analytics operators (as-of join, sessionization,
pivot, JSON extraction) over the events table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.operators import relational_ext as RX

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@gate(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the events.props payload column
    (semi-structured columns — beyond the reference's flat-row model)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing"),
    )


@gate(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id % 50 AS grp,
           {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values: per-user-bucket counts by event type —
    one shuffle, no value-discovery scan."""
    ev = load_table(spark, sf_dir, "events")
    out = RX.pivot_counts(
        ev, F.col("user_id") % 50, "event_type", EVENT_TYPES, F.count(F.lit(1))
    )
    return out.na.fill(0, EVENT_TYPES).select(
        "grp", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    )


@gate(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       -- floor() matches Spark's whole-second unix_timestamp
                       OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    s AS (
      SELECT user_id, event_id,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap): lag + cumulative-sum windows; output
    per-user session/event counts."""
    ev = load_table(spark, sf_dir, "events")
    s = RX.sessionize(ev, "user_id", "ts", gap_minutes=30.0, order_tiebreak="event_id")
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@gate(
    "asof_join_rates",
    oracle="""
    WITH rates AS (
      SELECT user_id, ts AS rate_ts,
             CAST(round(max(value)*100) AS BIGINT) AS rate_cents
      FROM events WHERE event_id % 37 = 0
      GROUP BY user_id, ts
    )
    SELECT e.event_id,
           coalesce(r.rate_cents, -1) AS rate_cents
    FROM events e
    ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts >= r.rate_ts
    """,
)
def q_asof_join_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the most recent 'rate' row at or before
    its timestamp (union + window construction — Spark has no native as-of;
    DuckDB's native ASOF JOIN is the oracle).  No match → -1 sentinel."""
    ev = load_table(spark, sf_dir, "events")
    rates = (
        ev.filter(F.col("event_id") % 37 == 0)
        .groupBy("user_id", F.col("ts").alias("rate_ts"))
        .agg(F.round(F.max("value") * 100).cast("long").alias("rate_cents"))
    )
    out = RX.asof_join(
        ev.select("event_id", "user_id", "ts"),
        rates,
        on=["user_id"],
        left_ts="ts",
        right_ts="rate_ts",
        right_values=["rate_cents"],
    )
    return out.select(
        "event_id",
        F.coalesce(F.col("rate_cents_asof"), F.lit(-1)).cast("long").alias("rate_cents"),
    )


@gate(
    "interval_join_counts",
    oracle="""
    WITH iv AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             CAST(ts AS DATE) + INTERVAL (user_id % 12) HOUR AS w_start,
             CAST(ts AS DATE) + INTERVAL (user_id % 12 + 4) HOUR AS w_end
      FROM events
    )
    SELECT CAST(iv.user_id AS BIGINT) AS user_id, CAST(iv.day AS VARCHAR) AS day,
           CAST(count(e.event_id) AS BIGINT) AS n_in_window,
           CAST(coalesce(sum(CAST(round(e.value*100) AS BIGINT)), 0) AS BIGINT) AS cents
    FROM iv JOIN events e
      ON e.user_id = iv.user_id AND e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY iv.user_id, iv.day
    """,
)
def q_interval_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big point-in-interval join via time banding
    (relational_ext.interval_join): per (user, day) a 4-hour window whose
    offset depends on the user; count/sum the user's events inside it.
    The oracle is DuckDB's native inequality join; Spark's scalable plan
    is band-explode + shuffled equi-join + exact filter (a bare
    inequality join would be a nested-loop)."""
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
        )
        .distinct()
        .select(
            "user_id",
            "day",
            (F.col("day").cast("timestamp") + (F.col("user_id") % 12) * F.expr("INTERVAL 1 HOUR")).alias("w_start"),
            (F.col("day").cast("timestamp") + (F.col("user_id") % 12 + 4) * F.expr("INTERVAL 1 HOUR")).alias("w_end"),
        )
    )
    joined = RX.interval_join(
        ev.select("user_id", "ts", "event_id", "value"),
        iv,
        on=["user_id"],
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        band_seconds=4 * 3600,
    )
    return joined.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("day").cast("string").alias("day"),
    ).agg(
        F.count("event_id").alias("n_in_window"),
        F.coalesce(F.sum(F.round(F.col("value") * 100).cast("long")), F.lit(0)).alias("cents"),
    )


@gate(
    "range_frame_sum",
    oracle="""
    SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_1h
    FROM events
    WHERE user_id % 50 = 0
    """,
)
def q_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, rolling 1-hour sum of value.
    Both engines order by epoch MICROSECONDS (bigint) with a numeric
    RANGE frame — ordering by seconds would truncate sub-second
    timestamps and shift frame boundaries between engines.  Complements
    rolling_window_avg (ROWS frame) with the RANGE-frame family."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("cents_1h"),
    )


@gate(
    "funnel_stages",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.t1
        AND e.ts <= t1.t1 + INTERVAL 6 HOUR GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        AND e.ts <= t2.t2 + INTERVAL 6 HOUR GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                     WHEN t2.user_id IS NOT NULL THEN 2
                     WHEN t1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
           LEFT JOIN t3 USING (user_id)
    GROUP BY 1
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase, strictly
    increasing timestamps, each step within a 6-hour deadline): stage reached per user, user counts per
    stage.  Spark computes all three stage timestamps in chained window
    passes over ONE user-partitioning (single shuffle — the windows reuse
    the exchange); the oracle derives them with three sequential
    join-aggregates.  Event-analytics surface beyond the reference's
    batch splits (SURVEY §1.4)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 6 HOUR")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 6 HOUR")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
        ).alias("stage")
    )
    return per_user.groupBy(F.col("stage").cast("long").alias("stage")).agg(
        F.count("*").alias("n_users")
    )


@gate(
    "cohort_retention",
    oracle="""
    WITH fw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, fw.cohort_week,
             CAST(date_diff('day', fw.cohort_week, date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
      FROM events e JOIN fw USING (user_id)
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users grouped by first-active ISO week,
    distinct active users per (cohort, week-offset).  Both engines
    truncate to Monday weeks; offsets via day-diff/7 (integer).  The
    first-week per user comes from one window pass (shuffle shared with
    the distinct)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        ev.withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy(
        F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
        "week_offset",
    ).agg(F.count("*").alias("n_users"))


@gate(
    "map_functions",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column plumbing: per-user event_type→count map built
    with map_from_entries, probed with try_element_at, sized with
    map_keys — then folded to scalars for the oracle (which computes the
    same numbers relationally; map columns themselves don't hash-compare
    across engines).  Extends the reference's flat-row type surface
    (SURVEY §1.2 'no maps anywhere')."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = per.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.coalesce(F.try_element_at("m", F.lit("click")), F.lit(0)).cast("long").alias("n_click"),
        F.coalesce(F.try_element_at("m", F.lit("purchase")), F.lit(0)).cast("long").alias("n_purchase"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("types"),
    )


@gate(
    "resample_daily_ffill",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id % 50 = 0),
    spine AS (
      SELECT u.user_id, CAST(d AS DATE) AS day
      FROM u CROSS JOIN generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                        INTERVAL 1 DAY) AS t(d)
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE user_id % 50 = 0
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    joined AS (
      SELECT s.user_id, s.day, d.cents,
             CAST(d.cents IS NOT NULL AS INT) AS observed
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(day AS VARCHAR) AS day,
           CAST(coalesce(
             cents,
             last_value(cents IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             -1) AS BIGINT) AS cents_filled,
           CAST(observed AS BIGINT) AS observed
    FROM joined
    """,
)
def q_resample_daily_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a regular daily grid with forward fill:
    calendar spine (sequence + explode) ⟕ daily aggregates, gaps carry
    the last observation (last_value IGNORE NULLS window), -1 before the
    first observation.  The gap-filling prerequisite for the reference's
    precomputed pm25 lag/rolling features (SURVEY §1.4) — lag features
    are only meaningful on a regular grid."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    joined = spine.join(daily, ["user_id", "day"], "left").withColumn(
        "observed", F.col("cents").isNotNull().cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("day").cast("string").alias("day"),
        F.coalesce(
            F.col("cents"),
            F.last("cents", ignorenulls=True).over(w),
            F.lit(-1),
        ).cast("long").alias("cents_filled"),
        F.col("observed").cast("long").alias("observed"),
    )


@gate(
    "activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    marked AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER
                 (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island_key
      FROM days
    ),
    islands AS (
      SELECT user_id, island_key, CAST(count(*) AS BIGINT) AS len,
             min(day) AS start_day
      FROM marked GROUP BY user_id, island_key
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(min(start_day) AS VARCHAR) AS first_day
    FROM islands GROUP BY user_id
    """,
)
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the (day − row_number) constant-key trick — one window pass + two
    aggregations, the streak/retention idiom that has no direct operator
    in any engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = days.withColumn(
        "island_key", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = marked.groupBy("user_id", "island_key").agg(
        F.count("*").alias("len"), F.min("day").alias("start_day")
    )
    return islands.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("*").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
        F.min("start_day").cast("string").alias("first_day"),
    )


@gate(
    "share_of_total",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS prio, year(o_orderdate) AS yr,
             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT prio, CAST(yr AS BIGINT) AS yr, cents,
           CAST(round(CAST(cents AS DOUBLE) /
                sum(cents) OVER (PARTITION BY yr), 6) AS DOUBLE) AS share_of_year,
           CAST(round(CAST(cents AS DOUBLE) / sum(cents) OVER (), 6) AS DOUBLE) AS share_total
    FROM c
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total windows at two grains (per-year partition and
    global): unpartitioned window sums over the AGGREGATED relation (35
    rows), never the fact table — the share-of-total idiom with the
    single-partition hazard confined to post-aggregation data.  Integer
    cents numerators/denominators make the double division identical
    across engines."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.year("o_orderdate").alias("yr0"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    wy = Window.partitionBy("yr0")
    wall = Window.partitionBy()
    return c.select(
        "prio",
        F.col("yr0").cast("long").alias("yr"),
        "cents",
        F.round(F.col("cents").cast("double") / F.sum("cents").over(wy), 6)
        .cast("double").alias("share_of_year"),
        F.round(F.col("cents").cast("double") / F.sum("cents").over(wall), 6)
        .cast("double").alias("share_total"),
    )


@gate(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences (the
    Markov-chain statistic behind next-event prediction and path
    analysis): one lag window with a (ts, event_id) total order, then a
    count matrix — 25 cells from millions of rows, all map-side
    combinable."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
