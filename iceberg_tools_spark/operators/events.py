"""Event-stream analytics battery (SURVEY.md §2.3) over `events`.

Batch analogues of the streaming jobs: gap sessionization, tumbling
windows, as-of join, funnel, cohort retention, exact dedup. Every
operator is one hash-shuffle on its entity key (user_id) followed by
in-partition window evaluation — at 100 TB this is the minimal-
shuffle plan (repartition by user, sort within partition, stream).

`events.ts` arrives as TIMESTAMP_NTZ via ``load_table`` (the parquet
file is nanos; see sources/readers.py). All timestamp arithmetic is
NTZ ± INTERVAL — session-timezone independent in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

D12_2 = "decimal(12,2)"


def _dec(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(D12_2)


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new
    session. lag → flag → running sum → per-session aggregates,
    all inside one user_id partition."""
    e = load_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    is_new = F.when(
        lag_ts.isNull() | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sid = (
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
    )
    return (
        e.withColumn("session_idx", sid)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("decimal(38,2)").alias("sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged)
SELECT user_id, session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_value
FROM sessions
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event type: the batch equivalent of
    the streaming windowed aggregate (date_trunc = window start)."""
    e = load_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    # NOT date_trunc: that returns a session-TZ TIMESTAMP_LTZ. Whole
    # hours since the NTZ epoch, re-added to the epoch, stays NTZ and
    # is timezone-independent in any session.
    window_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        e.groupBy(
            window_start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("decimal(38,2)").alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


SESSION_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent
    order at-or-before the event time (inclusive).

    Composition (no range-join explosion): orders deduped to one row
    per (user, date) — max orderkey — then a union-tag + running
    last_value(ignoreNulls) window over (user, time). ONE shuffle on
    user_id; at scale this is exactly the repartition+sort plan an
    engine-native as-of join would pick.

    Oracle: DuckDB's native ASOF JOIN on the same deduped orders
    (dedup makes the as-of match unique, so both definitions agree).
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    e = load_table(spark, sf_dir, "events", ["event_id", "ts", "user_id"])
    od = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("okey"))
        .select(
            F.col("o_custkey").alias("uid"),
            F.col("o_orderdate").alias("t"),
            "okey",
            F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    ev = e.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("okey"),
        F.lit(1).alias("tag"),
        "event_id",
    )
    un = od.unionByName(ev)
    w = Window.partitionBy("uid").orderBy(
        "t", "tag", F.coalesce("okey", F.lit(-1))
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        un.withColumn("last_order_key", F.last("okey", ignorenulls=True).over(w))
        .withColumn(
            "last_order_date",
            F.last(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True).over(w),
        )
        .filter((F.col("tag") == 1) & F.col("last_order_key").isNotNull())
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("t").alias("ts"),
            "last_order_key",
            F.col("last_order_date").cast("date").alias("last_order_date"),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH od AS (
  SELECT o_custkey AS uid, o_orderdate AS t, MAX(o_orderkey) AS last_order_key
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.user_id, e.ts, od.last_order_key,
       CAST(od.t AS DATE) AS last_order_date
FROM events e
ASOF JOIN od ON e.user_id = od.uid AND e.ts >= od.t
ORDER BY e.event_id
"""


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel: first view → first later click →
    first later purchase; counts of users reaching each stage.

    Three user-keyed aggregations (same shuffle key, AQE-coalesced);
    the stage tables are per-user singletons so the re-joins are
    key-unique.
    """
    e = load_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


FUNNEL_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase
"""


def retention_day_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active again within 7/14/28 days of
    their first activity day, grouped by cohort date."""
    e = load_table(spark, sf_dir, "events", ["user_id", "ts"])
    activity = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("d").alias("cohort"))
    flags = (
        activity.join(firsts, "user_id")
        .groupBy("user_id", "cohort")
        .agg(
            F.max(
                F.when((F.col("d") > F.col("cohort")) & (F.col("d") <= F.date_add("cohort", 7)), 1).otherwise(0)
            ).alias("r7"),
            F.max(
                F.when((F.col("d") > F.col("cohort")) & (F.col("d") <= F.date_add("cohort", 14)), 1).otherwise(0)
            ).alias("r14"),
            F.max(
                F.when((F.col("d") > F.col("cohort")) & (F.col("d") <= F.date_add("cohort", 28)), 1).otherwise(0)
            ).alias("r28"),
        )
    )
    return (
        flags.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("r7").cast("bigint").alias("retained_7"),
            F.sum("r14").cast("bigint").alias("retained_14"),
            F.sum("r28").cast("bigint").alias("retained_28"),
        )
        .orderBy("cohort")
    )


RETENTION_SQL = """
WITH activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS cohort FROM activity GROUP BY user_id),
flags AS (
  SELECT a.user_id, f.cohort,
         MAX(CASE WHEN a.d > f.cohort AND a.d <= f.cohort + 7 THEN 1 ELSE 0 END) AS r7,
         MAX(CASE WHEN a.d > f.cohort AND a.d <= f.cohort + 14 THEN 1 ELSE 0 END) AS r14,
         MAX(CASE WHEN a.d > f.cohort AND a.d <= f.cohort + 28 THEN 1 ELSE 0 END) AS r28
  FROM activity a JOIN firsts f ON a.user_id = f.user_id
  GROUP BY a.user_id, f.cohort)
SELECT cohort, COUNT(*) AS n_users,
       CAST(SUM(r7) AS BIGINT) AS retained_7,
       CAST(SUM(r14) AS BIGINT) AS retained_14,
       CAST(SUM(r28) AS BIGINT) AS retained_28
FROM flags
GROUP BY cohort
ORDER BY cohort
"""


def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent event dedup: one survivor per (user_id, event_type,
    ts) — highest value, then lowest event_id. The synthetic data has
    no duplicates, so this is an identity-preserving pass; the
    row_number plan is what matters (single shuffle on the dedup key,
    no distinct-then-join)."""
    e = load_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    w = Window.partitionBy("user_id", "event_type", "ts").orderBy(
        _dec("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            _dec("value").alias("value"),
        )
        .orderBy("event_id")
    )


EVENTS_DEDUP_SQL = """
SELECT event_id, user_id, event_type, ts, CAST(value AS DECIMAL(12,2)) AS value
FROM (
  SELECT event_id, user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, ts
                            ORDER BY CAST(value AS DECIMAL(12,2)) DESC, event_id) AS rn
  FROM events) t
WHERE rn = 1
ORDER BY event_id
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes × event type — the
    batch twin of the streaming sliding windowed aggregate.

    Composition: each event belongs to exactly 4 overlapping
    windows; explode the 4 window starts map-side (integer
    arithmetic on the NTZ epoch, timezone-independent), then ONE
    partial-agg shuffle on (window_start, event_type).
    """
    e = load_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    # window starts: the 4 quarter-hour marks in (ts - 1h, ts]
    starts = F.expr(
        "transform(sequence(0, 3), k -> timestampadd(MINUTE,"
        " (timestampdiff(MINUTE, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 15 - k) * 15,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00'))"
    )
    return (
        e.select(F.explode(starts).alias("window_start"), "event_type", _dec("value").alias("v"))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("decimal(38,2)").alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


SLIDING_WINDOW_SQL = """
WITH ex AS (
  SELECT date_trunc('hour', ts)
           + to_minutes((CAST(extract(minute FROM ts) AS BIGINT) // 15) * 15)
           - to_minutes(k * 15) AS window_start,
         event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events, (SELECT unnest(range(4)) AS k) ks)
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(v) AS DECIMAL(38,2)) AS sum_value
FROM ex
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: parse the JSON `props`
    payload (`{"k": N}`) and aggregate the extracted field per
    event type.

    Scale: `get_json_object` is a map-side JVM expression (no UDF,
    no schema inference pass); one partial-agg shuffle on the
    5-value type key.
    """
    e = load_table(spark, sf_dir, "events", ["event_type", "props"])
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count("k"))
            .cast("decimal(38,6)")
            .alias("avg_k"),
        )
        .orderBy("event_type")
    )


EVENTS_PROPS_SQL = """
WITH x AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(CAST(SUM(k) AS DOUBLE) / COUNT(k) AS DECIMAL(38,6)) AS avg_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: first view → first click within 7 days
    of the view → first purchase within 7 days of that click; user
    counts per stage plus the view→purchase conversion ratio.

    Same per-user singleton join shape as the unbounded funnel (one
    shuffle key throughout); the window bound is a residual range
    predicate on the key-unique join — no pair explosion.
    """
    e = load_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vt"))
            & (F.col("ts") <= F.col("vt") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("ct"))
            & (F.col("ts") <= F.col("ct") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_7d")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_7d")))
        .select(
            "n_view",
            "n_click_7d",
            "n_purchase_7d",
            (F.col("n_purchase_7d").cast("double") / F.col("n_view").cast("double"))
            .cast("decimal(38,6)")
            .alias("conversion"),
        )
    )


FUNNEL_WINDOWED_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 7 DAY
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 7 DAY
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_7d,
       (SELECT COUNT(*) FROM p) AS n_purchase_7d,
       CAST(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
            / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS DECIMAL(38,6)) AS conversion
"""


def retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort week (of first
    activity) × week offset 0..4 → distinct active users. The
    classic triangle chart, computed with two user-keyed shuffles.
    """
    e = load_table(spark, sf_dir, "events", ["user_id", "ts"])
    # Monday-start week via integer day arithmetic on the NTZ epoch
    # (1970-01-01 was a Thursday: shift by 3 days) — identical in
    # both engines, no locale-dependent date_trunc('week')
    week = F.expr(
        "date_add(DATE '1970-01-05', "
        "CAST(floor((datediff(CAST(ts AS DATE), DATE '1970-01-05')) / 7) * 7 AS INT))"
    )
    activity = e.select("user_id", week.alias("w")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        activity.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7).cast("bigint").alias("week_offset"),
        )
        .filter(F.col("week_offset") <= 4)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_MATRIX_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id,
         DATE '1970-01-05' + CAST(floor((CAST(ts AS DATE) - DATE '1970-01-05') / 7) * 7 AS INT) AS w
  FROM events),
firsts AS (SELECT user_id, MIN(w) AS cohort_week FROM activity GROUP BY user_id)
SELECT f.cohort_week, CAST((a.w - f.cohort_week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN firsts f ON a.user_id = f.user_id
WHERE (a.w - f.cohort_week) / 7 <= 4
GROUP BY f.cohort_week, CAST((a.w - f.cohort_week) / 7 AS BIGINT)
ORDER BY cohort_week, week_offset
"""
