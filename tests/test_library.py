"""Unit tests for the generic reusable library (SURVEY §2.5):
asof_join, sessionize, top_k_per_group, hashing — on small in-memory
frames with hand-computed expectations, plus cross-engine checks of
the hash arithmetic against hashlib and DuckDB."""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from iceberg_tools_spark.functions import hashing
from iceberg_tools_spark.operators.asof import asof_join
from iceberg_tools_spark.operators.sessionize import assign_sessions, sessionize
from iceberg_tools_spark.operators.topk import top_k_per_group


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---- asof ----------------------------------------------------------


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:03"), 100.0),
            ("A", _ts("2024-01-01 10:00:10"), 101.0),
            ("B", _ts("2024-01-01 10:00:05"), 50.0),
            ("C", _ts("2024-01-01 10:00:01"), 7.0),  # no quote ever
        ],
        "sym string, t timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 99.5),
            ("A", _ts("2024-01-01 10:00:03"), 99.9),  # equal ts → backward matches
            ("A", _ts("2024-01-01 10:00:08"), 100.5),
            ("B", _ts("2024-01-01 10:00:30"), 49.0),  # only AFTER the trade
        ],
        "sym string, qt timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t", right_time="qt",
        right_values=["bid"],
    )
    got = {(r.sym, r.t.isoformat()): (r.bid_asof, r.qt_asof) for r in out.collect()}
    assert got[("A", "2024-01-01T10:00:03")][0] == 99.9  # inclusive <=
    assert got[("A", "2024-01-01T10:00:10")][0] == 100.5
    assert got[("B", "2024-01-01T10:00:05")] == (None, None)  # quote is later
    assert got[("C", "2024-01-01T10:00:01")] == (None, None)
    assert out.count() == trades.count()  # left-outer: every trade kept


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t", right_time="qt",
        right_values=["bid"], direction="forward",
    )
    got = {(r.sym, r.t.isoformat()): r.bid_asof for r in out.collect()}
    assert got[("A", "2024-01-01T10:00:03")] == 99.9  # inclusive >=
    assert got[("B", "2024-01-01T10:00:05")] == 49.0
    assert got[("C", "2024-01-01T10:00:01")] is None


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t", right_time="qt",
        right_values=["bid"], tolerance="2 SECONDS",
    )
    got = {(r.sym, r.t.isoformat()): r.bid_asof for r in out.collect()}
    assert got[("A", "2024-01-01T10:00:03")] == 99.9  # 0s away: kept
    assert got[("A", "2024-01-01T10:00:10")] == 100.5  # 2s away: kept
    # B/C unmatched stay None
    assert got[("B", "2024-01-01T10:00:05")] is None


def test_asof_right_tiebreak(spark):
    # two quotes at the identical (sym, time): greatest tiebreak wins
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:05"), 1.0)], "sym string, t timestamp, price double"
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:05"), 10.0, 1),
            ("A", _ts("2024-01-01 10:00:05"), 20.0, 2),
            ("A", _ts("2024-01-01 10:00:05"), 15.0, 3),
        ],
        "sym string, qt timestamp, bid double, seq int",
    ).repartition(3)
    for direction in ("backward", "forward"):
        out = asof_join(
            trades, quotes, on=["sym"], left_time="t", right_time="qt",
            right_values=["bid"], direction=direction, right_tiebreak="seq",
        )
        assert [r.bid_asof for r in out.collect()] == [15.0]


def test_asof_matches_duckdb_asof_join(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t", right_time="qt",
        right_values=["bid"],
    )
    spark_rows = sorted(
        (r.sym, r.t.isoformat(), r.price, r.bid_asof) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE trades(sym VARCHAR, t TIMESTAMP, price DOUBLE);"
        "CREATE TABLE quotes(sym VARCHAR, qt TIMESTAMP, bid DOUBLE)"
    )
    con.executemany(
        "INSERT INTO trades VALUES (?, ?, ?)",
        [(r.sym, r.t, r.price) for r in trades.collect()],
    )
    con.executemany(
        "INSERT INTO quotes VALUES (?, ?, ?)",
        [(r.sym, r.qt, r.bid) for r in quotes.collect()],
    )
    duck = sorted(
        (s, t.isoformat(), p, b)
        for s, t, p, b in con.execute(
            "SELECT tr.sym, tr.t, tr.price, q.bid FROM trades tr "
            "ASOF LEFT JOIN quotes q ON tr.sym = q.sym AND tr.t >= q.qt"
        ).fetchall()
    )
    assert spark_rows == duck


# ---- sessionize ----------------------------------------------------


def test_assign_sessions_gap(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),
            (1, _ts("2024-01-01 10:20:00")),  # 20m gap: same session
            (1, _ts("2024-01-01 11:00:00")),  # 40m gap: new session
            (2, _ts("2024-01-01 09:00:00")),
        ],
        "uid bigint, ts timestamp",
    )
    out = assign_sessions(df, ["uid"], "ts", gap="30 MINUTES")
    got = {(r.uid, r.ts.isoformat()): r.session_idx for r in out.collect()}
    assert got[(1, "2024-01-01T10:00:00")] == 1
    assert got[(1, "2024-01-01T10:20:00")] == 1
    assert got[(1, "2024-01-01T11:00:00")] == 2
    assert got[(2, "2024-01-01T09:00:00")] == 1


def test_sessionize_aggregates(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 5.0),
            (1, _ts("2024-01-01 10:10:00"), 7.0),
            (1, _ts("2024-01-01 12:00:00"), 1.0),
        ],
        "uid bigint, ts timestamp, v double",
    )
    out = sessionize(
        df, ["uid"], "ts", gap="30 MINUTES", aggs={"sum_v": F.sum("v")}
    ).orderBy("uid", "session_idx")
    rows = out.collect()
    assert [(r.session_idx, r.n_events, r.sum_v) for r in rows] == [
        (1, 2, 12.0),
        (2, 1, 1.0),
    ]
    assert rows[0].session_start == _ts("2024-01-01 10:00:00")
    assert rows[0].session_end == _ts("2024-01-01 10:10:00")


# ---- topk ----------------------------------------------------------


@pytest.fixture()
def scores(spark):
    return spark.createDataFrame(
        [("g1", "a", 10), ("g1", "b", 20), ("g1", "c", 20), ("g1", "d", 5),
         ("g2", "e", 1)],
        "g string, id string, score bigint",
    )


def test_topk_row_number_exact_k(spark, scores):
    out = top_k_per_group(
        scores, ["g"], [F.col("score").desc(), "id"], k=2
    )
    got = sorted((r.g, r.id, r.rk) for r in out.collect())
    assert got == [("g1", "b", 1), ("g1", "c", 2), ("g2", "e", 1)]


def test_topk_rank_keeps_ties(spark, scores):
    out = top_k_per_group(scores, ["g"], [F.col("score").desc()], k=1, method="rank")
    got = sorted((r.g, r.id) for r in out.collect())
    assert got == [("g1", "b"), ("g1", "c"), ("g2", "e")]  # tie at rank 1 kept


def test_topk_rejects_bad_method(spark, scores):
    with pytest.raises(ValueError):
        top_k_per_group(scores, ["g"], ["score"], 1, method="nope")


# ---- hashing -------------------------------------------------------


def test_md5_i64_matches_python_and_duckdb(spark):
    vals = ["hello", "world", "", "Zürich"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", hashing.md5_i64("s").alias("h")).collect()
    }
    for v in vals:
        assert got[v] == hashing.md5_i64_py(v), v
    duck = dict(
        duckdb.connect()
        .execute(
            f"SELECT s, {hashing.md5_i64_duck('s')} AS h "
            "FROM (SELECT unnest(?::VARCHAR[]) AS s)",
            [vals],
        )
        .fetchall()
    )
    assert duck == got


def test_salted_md5_matches_hashlib(spark):
    df = spark.createDataFrame([("w",)], "s string")
    (row,) = df.select(hashing.salted_md5_hex("s", "3").alias("h")).collect()
    assert row.h == hashlib.md5(b"3|w").hexdigest()


def test_md5_bit_matches_duck(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "s string")
    bits = (
        df.select(
            "s",
            F.md5("s").alias("mh"),
        )
        .select("s", *[hashing.md5_bit("mh", j).alias(f"b{j}") for j in range(8)])
        .collect()
    )
    con = duckdb.connect()
    for r in bits:
        for j in range(8):
            (exp,) = con.execute(
                f"SELECT {hashing.md5_bit_duck(f'md5(?)', j)}", [r.s]
            ).fetchone()
            assert getattr(r, f"b{j}") == exp, (r.s, j)


def test_connectors_gated(spark):
    from iceberg_tools_spark.sources.connectors import (
        ConnectorUnavailable,
        read_delta,
        read_iceberg,
    )

    with pytest.raises(ConnectorUnavailable):
        read_iceberg(spark, "/tmp/nope")
    with pytest.raises(ConnectorUnavailable):
        read_delta(spark, "/tmp/nope")


def test_column_stats_one_pass_and_hll_bound(spark):
    from iceberg_tools_spark.operators.stats import (
        _ORDERS_COLS,
        approx_column_ndv,
        column_stats,
        column_stats_orders,
    )
    from iceberg_tools_spark.sources.readers import load_table

    sfd = "/root/testdata/sf0.01"
    # single-job shape: exactly one aggregate over one scan
    plan = (
        column_stats_orders(spark, sfd)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in column_stats_orders(spark, sfd).collect()
    }
    o = load_table(spark, sfd, "orders", _ORDERS_COLS)
    approx = {
        r["column_name"]: r["approx_ndv"]
        for r in approx_column_ndv(o, _ORDERS_COLS).collect()
    }
    for c, nd in exact.items():
        assert abs(approx[c] - nd) <= max(2, 0.1 * nd), (c, nd, approx[c])
