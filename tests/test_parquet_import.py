"""In-place parquet → Iceberg import (add_files analog): losslessness,
hive partition-column re-attach, footer-stat bounds driving scan
pruning, metadata-only cost (hard links, no rewrite)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from iceberg_tools_spark.iceberg.deletes import read_mor
from iceberg_tools_spark.iceberg.snapshots import plan_scan
from iceberg_tools_spark.sources.parquet_import import import_parquet_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def hive_lake(spark, tmp_path_factory):
    """Hive-partitioned copy of sf0.001 orders (priority dirs, the
    partition column absent from the parquet files) + its import."""
    root = tmp_path_factory.mktemp("pq_import")
    lake = str(root / "lake")
    (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .parquet(lake)
    )
    res = import_parquet_table(spark, lake, str(root / "table"))
    return lake, res


def test_import_lossless_and_partition_attach(spark, hive_lake):
    lake, res = hive_lake
    src = spark.read.parquet(lake)  # spark re-infers the hive column
    imported = read_mor(spark, res["metadata_path"], res["snapshot_id"])
    assert set(imported.columns) == set(src.columns)
    a = sorted(map(tuple, src.select(*sorted(src.columns)).collect()))
    b = sorted(map(tuple, imported.select(*sorted(src.columns)).collect()))
    assert a == b
    assert res["n_rows"] == len(a)


def test_import_is_metadata_only(hive_lake):
    """No data rewrite: every table data file is a hard link to (or
    byte-identical twin of) a source file — same inode."""
    lake, res = hive_lake
    data_dir = os.path.join(
        os.path.dirname(res["metadata_path"]).removesuffix("/metadata"), "data"
    )
    src_inodes = set()
    for r, _, names in os.walk(lake):
        src_inodes.update(os.stat(os.path.join(r, n)).st_ino
                          for n in names if n.endswith(".parquet"))
    linked = [os.path.join(data_dir, n) for n in os.listdir(data_dir)]
    assert linked and all(os.stat(p).st_ino in src_inodes for p in linked)


def test_import_partition_pred_prunes(spark, hive_lake):
    _, res = hive_lake
    plan = plan_scan(
        spark, res["metadata_path"], res["snapshot_id"],
        partition_pred={"o_orderpriority": "1-URGENT"},
    )
    rows = plan.collect()
    sel = [r for r in rows if r.selected]
    assert 0 < len(sel) < len(rows)
    # the selected files really are the 1-URGENT ones
    live = read_mor(spark, res["metadata_path"], res["snapshot_id"])
    n_urgent = live.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert sum(r.record_count for r in sel) == n_urgent


def test_import_footer_bounds_prune_flat_layout(spark, tmp_path):
    """Flat (unpartitioned) import of a range-partitioned write: the
    footer min/max bounds land in manifests, and a point predicate
    plans a strict subset of files WITHOUT any data read."""
    lake = str(tmp_path / "flat")
    (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(4, "o_orderkey")
        .write.parquet(lake)
    )
    res = import_parquet_table(spark, lake, str(tmp_path / "table"))
    assert res["n_files"] == 4 and res["partition_columns"] == []
    # field id 1 = o_orderkey; probe one known key
    some_key = (
        spark.read.parquet(lake).agg(F.min("o_orderkey")).collect()[0][0]
    )
    plan = plan_scan(
        spark, res["metadata_path"], res["snapshot_id"],
        field_id=1, lo=some_key, hi=some_key,
    )
    rows = plan.collect()
    sel = [r for r in rows if r.selected]
    assert len(rows) == 4 and len(sel) == 1


def test_import_long_typed_hive_partition(spark, tmp_path):
    """All-integer hive values type the partition column long, and
    the re-attached column comes back as bigint."""
    lake = str(tmp_path / "intlake")
    (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .select("o_orderkey", (F.col("o_custkey") % 4).alias("bucket"))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .parquet(lake)
    )
    res = import_parquet_table(spark, lake, str(tmp_path / "t2"))
    imported = read_mor(spark, res["metadata_path"], res["snapshot_id"])
    assert dict(imported.dtypes)["bucket"] == "bigint"
    src = spark.read.parquet(lake)
    assert (
        sorted(map(tuple, imported.groupBy("bucket").count().collect()))
        == sorted(map(tuple, src.groupBy("bucket").count().collect()))
    )


def test_import_writes_name_mapping(hive_lake):
    _, res = hive_lake
    meta = json.load(open(res["metadata_path"]))
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    names = {m["names"][0] for m in nm}
    assert "o_orderkey" in names and "o_orderpriority" in names


def test_import_rejects_non_hive_dirs(spark, tmp_path):
    os.makedirs(tmp_path / "bad" / "notkv")
    with open(tmp_path / "bad" / "notkv" / "x.parquet", "wb") as f:
        f.write(b"")
    with pytest.raises(ValueError, match="non-hive"):
        import_parquet_table(spark, str(tmp_path / "bad"), str(tmp_path / "t3"))


def test_timestamp_stat_exact_microseconds():
    """ADVICE r8: float total_seconds() math can be ±1µs off at
    modern epochs; the stat conversion must be exact integer
    arithmetic (a 1µs-high lower bound silently prunes a matching
    file)."""
    from datetime import datetime, timezone

    from iceberg_tools_spark.sources.parquet_import import (
        _stat_to_iceberg_value,
    )

    # a value whose float µs representation rounds wrong
    cases = [
        datetime(2026, 8, 15, 12, 34, 56, 789123),
        datetime(2038, 1, 19, 3, 14, 7, 999999),
        datetime(1970, 1, 1, 0, 0, 0, 1),
        datetime(1969, 12, 31, 23, 59, 59, 999999),  # negative epoch
    ]
    for v in cases:
        got = _stat_to_iceberg_value(v, "timestamp")
        td = v - datetime(1970, 1, 1)
        exact = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        assert got == exact
        # cross-check against a pure-integer reconstruction
        back = datetime(1970, 1, 1) + (v - datetime(1970, 1, 1))
        assert back == v
    # tz-aware values normalize to UTC first
    aware = datetime(2026, 8, 15, 12, 0, 0, 5, tzinfo=timezone.utc)
    assert _stat_to_iceberg_value(aware, "timestamptz") == \
        _stat_to_iceberg_value(aware.replace(tzinfo=None), "timestamp")


def test_import_date_typed_hive_partition(spark, tmp_path):
    """ADVICE r14 (medium): a hive lake partitioned by a DATE column
    — the partition column exists ONLY in directory names — imports
    with the column typed `date`, stores manifest partition values
    as raw int days, and read_mor re-attaches it as DateType (the
    former path inferred BIGINT and crashed on cast to date)."""
    import datetime as dt

    lake = str(tmp_path / "datelake")
    (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .select(
            "o_orderkey",
            F.date_add(F.lit("1995-01-01"), (F.col("o_orderkey") % 4)
                       .cast("int")).alias("day"),
        )
        .repartition("day")
        .write.partitionBy("day")
        .parquet(lake)
    )
    res = import_parquet_table(spark, lake, str(tmp_path / "t3"))
    assert res["partition_columns"] == ["day"]
    imported = read_mor(spark, res["metadata_path"], res["snapshot_id"])
    assert dict(imported.dtypes)["day"] == "date"
    src = spark.read.parquet(lake)
    a = sorted(map(tuple, src.select("o_orderkey", "day").collect()))
    b = sorted(map(tuple, imported.select("o_orderkey", "day").collect()))
    assert a == b
    assert all(isinstance(r[1], dt.date) for r in b[:5])


def test_attach_timestamp_partition_column(spark, tmp_path):
    """Log-only TIMESTAMP/TIMESTAMPTZ identity partitions attach
    from manifest micros (ADVICE r14: timestamp had no _ICE_TO_SPARK
    entry at all; date crashed on BIGINT→DATE cast)."""
    import datetime as dt

    from iceberg_tools_spark.iceberg.deletes import (
        attach_identity_partition_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, _rel string"
    ).selectExpr("id", "concat('f_', _rel, '.parquet') as _rel")

    class FakeMeta:
        raw = {
            "schemas": [{
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "type": "long"},
                    {"id": 2, "name": "ts", "type": "timestamptz"},
                    {"id": 3, "name": "d", "type": "date"},
                ],
            }],
            "current-schema-id": 0,
            "partition-specs": [{
                "spec-id": 0,
                "fields": [
                    {"name": "ts", "transform": "identity", "source-id": 2},
                    {"name": "d", "transform": "identity", "source-id": 3},
                ],
            }],
        }

    micros = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
    data = [
        {"rel": "f_a.parquet", "partition": {"ts": micros, "d": 19000}},
        {"rel": "f_b.parquet", "partition": {"ts": None, "d": None}},
    ]
    out = attach_identity_partition_columns(spark, df, data, FakeMeta())
    types = dict(out.dtypes)
    assert types["ts"] == "timestamp" and types["d"] == "date"
    rows = {r.id: (r.ts, r.d) for r in out.collect()}
    assert rows[1][1] == dt.date(1970, 1, 1) + dt.timedelta(days=19000)
    # the timestamptz instant is tz-pinned regardless of session tz
    assert rows[1][0] is not None
    assert rows[3] == (None, None)


def test_date_partition_pred_accepts_iso_and_objects(spark, tmp_path):
    """plan_scan partition predicates on DATE partitions take ISO
    strings or datetime.date objects — normalized to the manifests'
    raw int days (a string compare would silently select nothing)."""
    import datetime as dt

    lake = str(tmp_path / "dl2")
    (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .select(
            "o_orderkey",
            F.date_add(F.lit("1995-01-01"), (F.col("o_orderkey") % 3)
                       .cast("int")).alias("day"),
        )
        .repartition("day")
        .write.partitionBy("day")
        .parquet(lake)
    )
    res = import_parquet_table(spark, lake, str(tmp_path / "t4"))
    for pred in ("1995-01-02", dt.date(1995, 1, 2)):
        plan = plan_scan(
            spark, res["metadata_path"], res["snapshot_id"],
            partition_pred={"day": pred},
        )
        rows = plan.collect()
        sel = [r for r in rows if r.selected]
        assert 0 < len(sel) < len(rows), pred
        live = read_mor(spark, res["metadata_path"], res["snapshot_id"])
        n = live.filter(F.col("day") == "1995-01-02").count()
        assert sum(r.record_count for r in sel) == n
