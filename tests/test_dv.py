"""Iceberg v3 deletion vectors: portable Roaring serialization
(RoaringFormatSpec), the Puffin container, the deletion-vector-v1
blob codec, and the MoR read path over the DV fixture
(scripts/gen_dv_fixture.py)."""

from __future__ import annotations

import os
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_tools_spark.iceberg.puffin import (
    DV_MAGIC,
    decode_dv_blob,
    encode_dv_blob,
    read_deletion_vectors,
    read_puffin_footer,
    write_deletion_vectors,
    write_puffin,
)
from iceberg_tools_spark.iceberg.roaring import (
    deserialize_u32,
    deserialize_u64,
    serialize_u32,
    serialize_u64,
)

# ------------------------------------------------------- roaring


def _rt32(vals):
    buf = serialize_u32(vals)
    got, end = deserialize_u32(buf)
    assert end == len(buf)
    return got


def test_roaring_u32_round_trips():
    cases = [
        [],
        [0],
        [0xFFFFFFFF],
        [1, 2, 3],
        list(range(5000)),  # dense run container
        [i * 7 % 65536 for i in range(5000)],  # >4096 scattered: bitmap
        [i * 131 for i in range(3000)],  # arrays across several keys
        [0, 65535, 65536, 131072, 0xFFFF0000],
    ]
    for c in cases:
        assert _rt32(c) == sorted(set(c))


def test_roaring_u64_round_trips():
    cases = [
        [],
        [0, 1, 1 << 32, (1 << 32) + 5, (1 << 40) + 123, (1 << 63) + 7],
        list(range(10000)) + [(1 << 33) + i for i in range(100)],
    ]
    for c in cases:
        buf = serialize_u64(c)
        got, end = deserialize_u64(buf)
        assert got == sorted(set(c))
        assert end == len(buf)


def test_roaring_golden_array_container():
    # {1,2,3}: hand-assembled per the public RoaringFormatSpec —
    # cookie 12346, one container, key 0 / card-1 = 2, one offset
    # (16 = 4+4+4+4), then the three sorted uint16 values
    expected = (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 2)
        + struct.pack("<I", 16)
        + struct.pack("<3H", 1, 2, 3)
    )
    assert serialize_u32([3, 1, 2]) == expected


def test_roaring_golden_run_container():
    # {0..9}: run encoding (6 bytes) beats array (20) — cookie
    # 12347 | (size-1)<<16, 1-byte run flag, key 0 / card-1 = 9,
    # NO offsets (size < 4), then n_runs=1, (start=0, len-1=9)
    expected = (
        struct.pack("<I", 12347)
        + bytes([0x01])
        + struct.pack("<HH", 0, 9)
        + struct.pack("<HHH", 1, 0, 9)
    )
    assert serialize_u32(range(10)) == expected


def test_roaring_container_choice_is_size_minimal():
    # run of 10 → run container (6 < 20); 3 singleton gaps → array
    # (6 !< 6, ties prefer non-run); 5000 scattered → bitmap (8192)
    assert serialize_u32(range(10))[:2] == struct.pack("<H", 12347)
    assert serialize_u32([1, 2, 3])[:2] == struct.pack("<H", 12346)
    scattered = [i * 7 % 65536 for i in range(5000)]
    buf = serialize_u32(scattered)
    assert buf[:2] == struct.pack("<H", 12346)
    assert len(buf) == 8 + 4 + 4 + 8192  # header + desc + offset + bitmap


@settings(max_examples=25, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(0, 200_000),
            st.integers(0, (1 << 33)),
            st.builds(lambda base, n: base + n, st.sampled_from([0, 60_000]), st.integers(0, 9000)),
        ),
        max_size=9000,
    )
)
def test_roaring_u64_property(vals):
    buf = serialize_u64(vals)
    got, end = deserialize_u64(buf)
    assert got == sorted(vals)
    assert end == len(buf)


def test_roaring_rejects_out_of_range():
    with pytest.raises(ValueError):
        serialize_u32([-1])
    with pytest.raises(ValueError):
        serialize_u32([1 << 32])
    with pytest.raises(ValueError):
        serialize_u64([1 << 64])


# -------------------------------------------------------- puffin


def test_puffin_round_trip(tmp_path):
    p = str(tmp_path / "dv.puffin")
    metas = write_deletion_vectors(
        p,
        [("file:///t/A.parquet", list(range(10))), ("file:///t/C.parquet", [0, 2, 4])],
        snapshot_id=77,
        sequence_number=3,
    )
    assert [m["offset"] for m in metas] == [4, 4 + metas[0]["length"]]
    got = read_deletion_vectors(p)
    assert got == {
        "file:///t/A.parquet": list(range(10)),
        "file:///t/C.parquet": [0, 2, 4],
    }
    footer = read_puffin_footer(p)
    assert all(b["type"] == "deletion-vector-v1" for b in footer["blobs"])
    assert all(b["snapshot-id"] == 77 for b in footer["blobs"])


def test_puffin_corrupt_vector_crc_raises(tmp_path):
    p = str(tmp_path / "dv.puffin")
    metas = write_deletion_vectors(p, [("file:///t/A.parquet", [5, 6, 7])])
    buf = bytearray(open(p, "rb").read())
    # flip a byte INSIDE the serialized vector (past len+magic)
    buf[metas[0]["offset"] + 9] ^= 0xFF
    open(p, "wb").write(bytes(buf))
    with pytest.raises(ValueError):
        read_deletion_vectors(p)


def test_puffin_bad_magics_raise(tmp_path):
    p = str(tmp_path / "x.puffin")
    open(p, "wb").write(b"NOPE" + bytes(40))
    with pytest.raises(ValueError, match="head magic"):
        read_puffin_footer(p)
    write_deletion_vectors(p, [("f", [1])])
    buf = open(p, "rb").read()
    open(p, "wb").write(buf[:-2])  # chop the tail magic
    with pytest.raises(ValueError, match="tail magic"):
        read_puffin_footer(p)


def test_puffin_duplicate_reference_raises(tmp_path):
    p = str(tmp_path / "dup.puffin")
    write_puffin(
        p,
        [
            {
                "type": "deletion-vector-v1",
                "data": encode_dv_blob([1]),
                "properties": {"referenced-data-file": "f", "cardinality": "1"},
            }
            for _ in range(2)
        ],
    )
    with pytest.raises(ValueError, match="two deletion vectors"):
        read_deletion_vectors(p)


def test_puffin_cardinality_mismatch_raises(tmp_path):
    p = str(tmp_path / "card.puffin")
    write_puffin(
        p,
        [
            {
                "type": "deletion-vector-v1",
                "data": encode_dv_blob([1, 2]),
                "properties": {"referenced-data-file": "f", "cardinality": "3"},
            }
        ],
    )
    with pytest.raises(ValueError, match="cardinality"):
        read_deletion_vectors(p)


def test_dv_blob_codec():
    blob = encode_dv_blob([3, 1, 1 << 40])
    assert blob[4:8] == DV_MAGIC
    assert decode_dv_blob(blob) == [1, 3, 1 << 40]
    with pytest.raises(ValueError, match="magic"):
        decode_dv_blob(b"\x00\x00\x00\x08" + b"XXXX" + bytes(8))


# ------------------------------------------------- the DV fixture


def test_dv_fixture_mor_read(spark):
    from iceberg_tools_spark.iceberg.deletes import DV_DIR, DV_METADATA, read_mor

    df = read_mor(spark, DV_METADATA, 3003, DV_DIR)
    ids = sorted(r["id"] for r in df.collect())
    dead = set(range(1, 11)) | set(range(151, 156))
    assert len(ids) == 285
    assert set(ids) == set(range(1, 301)) - dead


def test_dv_fixture_time_travel_before_deletes(spark):
    # at 3002 the DVs don't exist yet: all 300 rows live
    from iceberg_tools_spark.iceberg.deletes import DV_DIR, DV_METADATA, read_mor

    assert read_mor(spark, DV_METADATA, 3002, DV_DIR).count() == 300


def test_dv_positions_frame_matches_declared(spark):
    from iceberg_tools_spark.iceberg.deletes import (
        DV_DIR,
        DV_METADATA,
        _dv_positions_frame,
        _is_dv,
        mor_entries_at,
    )
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    meta = parse_metadata(DV_METADATA)
    _, dels = mor_entries_at(meta, 3003, DV_DIR)
    dvs = [e for e in dels if _is_dv(e)]
    assert len(dvs) == 2
    rows = sorted(
        (r["pd_rel"], r["pd_pos"], r["pd_seq"])
        for r in _dv_positions_frame(spark, dvs).collect()
    )
    expected = sorted(
        [("data/category=x/A.parquet", p, 3) for p in range(10)]
        + [("data/category=x/C.parquet", p, 3) for p in range(5)]
    )
    assert rows == expected


def test_dv_equivalent_to_parquet_position_deletes(spark):
    # the SAME logical deletes expressed as v2 parquet position
    # deletes (MoR fixture pd1: A 0-9, C 0-4) and as v3 DVs must
    # yield identical survivor id sets over identical data files
    from iceberg_tools_spark.iceberg.deletes import (
        DV_DIR,
        DV_METADATA,
        MOR_DIR,
        MOR_METADATA,
        read_mor,
    )

    v3 = {r["id"] for r in read_mor(spark, DV_METADATA, 3003, DV_DIR).collect()}
    # v2 fixture at 2003 additionally applies the equality delete
    # (ids 260, 270); add them back for the position-only comparison
    v2 = {r["id"] for r in read_mor(spark, MOR_METADATA, 2003, MOR_DIR).collect()}
    assert v3 == v2 | {260, 270}


def test_dv_scan_tasks_attach_by_reference(spark):
    from iceberg_tools_spark.iceberg.deletes import scan_plan_tasks_dv

    rows = scan_plan_tasks_dv(spark, "").collect()
    by_file = {r["data_file"].rsplit("/", 1)[-1]: r for r in rows}
    assert by_file["A.parquet"]["apply_rule"] == "dv: data_seq <= delete_seq"
    assert by_file["C.parquet"]["apply_rule"] == "dv: data_seq <= delete_seq"
    assert by_file["B.parquet"]["apply_rule"] == "none"
    assert by_file["D.parquet"]["apply_rule"] == "none"


def test_dv_fixture_regeneration_is_deterministic(tmp_path):
    # regenerate into a scratch dir (OUT_DIR is a module global the
    # generator threads through every path) and byte-compare the
    # committed fixture's metadata artifacts
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen = os.path.join(repo, "scripts", "gen_dv_fixture.py")
    spec = importlib.util.spec_from_file_location("gen_dv_fixture_scratch", gen)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    scratch = str(tmp_path / "dv")
    mod.OUT_DIR = scratch
    mod.main()
    fixture = os.path.join(repo, "tests", "fixtures", "dv")
    for rel in [
        "v3.metadata.json",
        "metadata/m1.avro",
        "metadata/m5.avro",
        "metadata/snap-3003.avro",
        "data/deletes/dv1.puffin",
    ]:
        a = open(os.path.join(fixture, rel), "rb").read()
        b = open(os.path.join(scratch, *rel.split("/")), "rb").read()
        assert a == b, f"{rel} differs between committed fixture and regeneration"


# ------------------------------------------------- DV write path


@pytest.fixture()
def dv_scratch(spark):
    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import DV_DIR

    root = _scratch_table("dv_write_test_", DV_DIR)
    return root, os.path.join(root, "v3.metadata.json")


def test_delete_where_dv_merges_and_retires(spark, dv_scratch):
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at, read_mor, _is_dv
    from iceberg_tools_spark.iceberg.dml import delete_where_dv
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.iceberg.puffin import decode_dv_blob, read_blob

    root, mpath = dv_scratch
    res = delete_where_dv(spark, mpath, "id % 50 = 0")
    assert res["n_dvs"] == 4  # victims in all four files
    assert res["n_replaced"] == 2  # A and C had vectors already

    meta = parse_metadata(res["metadata_path"])
    _, dels = mor_entries_at(meta, res["snapshot_id"], root)
    dvs = {e["referenced_data_file"]: e for e in dels if _is_dv(e)}
    assert len(dvs) == 4  # one-DV-per-file invariant survived
    # A: old {0..9} ∪ new {49, 99} = 12; C: old {0..4} ∪ {49, 99} = 7
    card = {ref.rsplit("/", 1)[-1]: e["record_count"] for ref, e in dvs.items()}
    assert card == {"A.parquet": 12, "B.parquet": 1, "C.parquet": 7, "D.parquet": 1}
    a = dvs[next(r for r in dvs if r.endswith("A.parquet"))]
    positions = decode_dv_blob(
        read_blob(a["local_path"], a["content_offset"], a["content_size_in_bytes"])
    )
    assert positions == sorted(set(range(10)) | {49, 99})

    # live read: 285 - 6 = 279 rows, none divisible by 50
    live = read_mor(spark, res["metadata_path"], res["snapshot_id"], root)
    ids = {r["id"] for r in live.collect()}
    assert len(ids) == 279
    assert not any(i % 50 == 0 for i in ids)


def test_delete_where_dv_preserves_time_travel(spark, dv_scratch):
    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.iceberg.dml import delete_where_dv

    root, mpath = dv_scratch
    res = delete_where_dv(spark, mpath, "id % 50 = 0")
    # the pre-delete snapshots still read through their ORIGINAL
    # manifests: 3003 sees 285 live rows, 3002 all 300
    assert read_mor(spark, res["metadata_path"], 3003, root).count() == 285
    assert read_mor(spark, res["metadata_path"], 3002, root).count() == 300


def test_delete_where_dv_chains(spark, dv_scratch):
    # a second DV delete on the committed table replaces the
    # replacement: unions accumulate, invariant holds
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at, read_mor, _is_dv
    from iceberg_tools_spark.iceberg.dml import delete_where_dv
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    root, mpath = dv_scratch
    r1 = delete_where_dv(spark, mpath, "id % 50 = 0")
    r2 = delete_where_dv(spark, r1["metadata_path"], "id IN (11, 12)")
    assert r2["n_dvs"] == 1 and r2["n_replaced"] == 1  # A again
    meta = parse_metadata(r2["metadata_path"])
    _, dels = mor_entries_at(meta, r2["snapshot_id"], root)
    a = next(
        e for e in dels
        if _is_dv(e) and e["referenced_data_file"].endswith("A.parquet")
    )
    assert a["record_count"] == 14  # {0..9} ∪ {49, 99} ∪ {10, 11}
    assert read_mor(spark, r2["metadata_path"], r2["snapshot_id"], root).count() == 277


def test_delete_where_dv_no_match_raises(spark, dv_scratch):
    from iceberg_tools_spark.iceberg.dml import delete_where_dv

    root, mpath = dv_scratch
    with pytest.raises(ValueError, match="matched no live rows"):
        delete_where_dv(spark, mpath, "id = -1")


def test_delete_where_dv_on_v2_table_writes_first_vectors(spark):
    # the DV writer also works on a table whose existing deletes are
    # v2 parquet files: new DVs coexist with (and apply alongside)
    # the old positional/equality deletes
    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.dml import delete_where_dv

    root = _scratch_table("dv_on_v2_test_", MOR_DIR)
    mpath = os.path.join(root, "v2.metadata.json")
    res = delete_where_dv(spark, mpath, "id IN (30, 310)")
    assert res["n_dvs"] == 2 and res["n_replaced"] == 0
    # committing deletion vectors upgrades the table to v3 (DVs are
    # v3-only; leaving format-version 2 would be a spec-invalid state)
    from iceberg_tools_spark.iceberg.metadata import parse_metadata as _pm

    assert _pm(res["metadata_path"]).raw["format-version"] == 3
    live = read_mor(spark, res["metadata_path"], res["snapshot_id"], root)
    ids = {r["id"] for r in live.collect()}
    assert len(ids) == 321  # 323 - 2
    assert 30 not in ids and 310 not in ids
    # the v2 deletes still apply (pd1: ids 1-10; ed1: 260, 270)
    assert 5 not in ids and 260 not in ids


# ------------------------------------ maintenance on DV tables


def test_rewrite_data_files_folds_deletion_vectors(spark, dv_scratch):
    from iceberg_tools_spark.iceberg.deletes import (
        mor_entries_at,
        plan_scan_tasks,
        read_mor,
    )
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    root, mpath = dv_scratch
    before = sorted(r["id"] for r in read_mor(spark, mpath, 3003, root).collect())
    # target detection reads NO files for DVs: the manifest names
    # the referenced file and carries the cardinality
    res = rewrite_data_files(spark, mpath, base_dir=root)
    assert sorted(res["rewritten"]) == [
        "data/category=x/A.parquet", "data/category=x/C.parquet",
    ]
    after = sorted(
        r["id"]
        for r in read_mor(spark, res["metadata_path"], res["snapshot_id"], root).collect()
    )
    assert after == before  # fold preserved row-level state
    # the folded files plan clean: their old vectors never attach
    meta = parse_metadata(res["metadata_path"])
    tasks = plan_scan_tasks(meta, res["snapshot_id"], root)
    by_file = {t[0].rsplit("/", 1)[-1]: t[5] for t in tasks}
    assert by_file[f"A-rw{res['snapshot_id']}.parquet"] == "none"
    assert by_file[f"C-rw{res['snapshot_id']}.parquet"] == "none"


def test_rewrite_position_deletes_skips_vectors(spark):
    # on a v2 table that ALSO carries a deletion vector, compaction
    # touches only the parquet position deletes; the vector still
    # applies afterward
    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.dml import delete_where_dv
    from iceberg_tools_spark.iceberg.rewrite_deletes import rewrite_position_deletes

    root = _scratch_table("dv_rwpd_test_", MOR_DIR)
    mpath = os.path.join(root, "v2.metadata.json")
    r1 = delete_where_dv(spark, mpath, "id IN (30, 310)")
    r2 = rewrite_position_deletes(spark, r1["metadata_path"], base_dir=root)
    assert r2["removed_files"] == 1  # pd1.parquet only; the DV stays
    live = read_mor(spark, r2["metadata_path"], r2["snapshot_id"], root)
    ids = {r["id"] for r in live.collect()}
    assert len(ids) == 321
    assert 30 not in ids and 310 not in ids  # the vector survived
    assert 5 not in ids  # compacted parquet deletes still apply


@settings(max_examples=15, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(0, 300_000),
            st.builds(lambda b, n: b + n, st.sampled_from([0, 70_000, 1 << 33]), st.integers(0, 6000)),
        ),
        max_size=7000,
    )
)
def test_roaring_numpy_and_scalar_paths_agree(vals):
    # the vectorized fast path must produce byte-identical output to
    # the scalar reference implementation (and both must read each
    # other's bytes)
    import iceberg_tools_spark.iceberg.roaring as roaring

    np_bytes = roaring.serialize_u64(vals)
    saved = roaring._np
    roaring._np = None
    try:
        py_bytes = roaring.serialize_u64(vals)
        py_vals, _ = roaring.deserialize_u64(np_bytes)
    finally:
        roaring._np = saved
    assert np_bytes == py_bytes
    assert py_vals == sorted(vals)
    np_vals, _ = roaring.deserialize_u64(py_bytes)
    assert np_vals == sorted(vals)


def test_manifest2json_reads_v3_dv_manifest():
    # the reference-parity CLI surface extends to v3: locator fields
    # render with Avro union type labels, exactly like every other
    # optional field (IcebergEncoder union-label convention)
    import io
    import json as _json

    from iceberg_tools_spark.iceberg.manifest2json import manifest2json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    buf = io.StringIO()
    manifest2json(
        os.path.join(repo, "tests", "fixtures", "dv", "metadata", "m5.avro"),
        os.path.join(repo, "tests", "fixtures", "dv", "v3.metadata.json"),
        buf,
    )
    recs = [
        _json.loads(line.rstrip(","))
        for line in buf.getvalue().splitlines()
        if line.strip() not in ("[", "]", "")
    ]
    assert len(recs) == 2
    for rec in recs:
        df = rec["data_file"]
        assert df["content"] == 1
        assert df["file_format"] == "PUFFIN"
        assert df["referenced_data_file"]["string"].endswith(".parquet")
        assert df["content_offset"]["long"] >= 4
        assert df["content_size_in_bytes"]["long"] > 0


def test_update_where_dv_mode(spark, dv_scratch):
    # UPDATE through v3 staging: old row versions become deletion
    # vectors (merged with A's existing vector), updated versions
    # appear as new data files in the same snapshot
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at, read_mor, _is_dv
    from iceberg_tools_spark.iceberg.dml import update_where
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    root, mpath = dv_scratch
    res = update_where(
        spark, mpath, "id IN (20, 160)", {"id": "id + 9000"}, use_dv=True
    )
    live = read_mor(spark, res["metadata_path"], res["snapshot_id"], root)
    ids = {r["id"] for r in live.collect()}
    assert live.count() == 285  # row count preserved by UPDATE
    assert 20 not in ids and 160 not in ids
    assert 9020 in ids and 9160 in ids
    meta = parse_metadata(res["metadata_path"])
    _, dels = mor_entries_at(meta, res["snapshot_id"], root)
    dvs = {e["referenced_data_file"].rsplit("/", 1)[-1]: e
           for e in dels if _is_dv(e)}
    # A's vector merged ({0..9} + pos 19 of id 20 = 11); C got a new
    # one (pos 9 of id 160)
    assert dvs["A.parquet"]["record_count"] == 11
    assert dvs["C.parquet"]["record_count"] == 6
    assert len(dvs) == 2


def test_merge_into_dv_mode(spark, dv_scratch):
    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.iceberg.dml import merge_into

    root, mpath = dv_scratch
    source = spark.createDataFrame(
        [(120, "y"), (990, "w")], "id bigint, category string"
    )
    res = merge_into(
        spark,
        mpath,
        source,
        "t.id = s.id",
        when_matched=("update", {"id": "t.id + 1000"}),
        when_not_matched_insert=True,
        use_dv=True,
    )
    live = read_mor(spark, res["metadata_path"], res["snapshot_id"], root)
    ids = {r["id"] for r in live.collect()}
    assert 120 not in ids and 1120 in ids  # matched: updated via DV
    assert 990 in ids  # not matched: inserted
    assert live.count() == 286  # 285 + 1 insert


def test_orphan_removal_protects_dv_puffin(spark, dv_scratch):
    # the protected set covers delete-file entries of every kind:
    # a stray next to the vector goes, the vector itself survives
    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.iceberg.maintenance import delete_orphan_files

    root, mpath = dv_scratch
    stray = os.path.join(root, "data", "deletes", "stray.puffin")
    with open(stray, "wb") as f:
        f.write(b"junk")
    res = delete_orphan_files(spark, mpath)
    assert [p.rsplit("/", 1)[-1] for p in res["orphans"]] == ["stray.puffin"]
    assert os.path.exists(os.path.join(root, "data", "deletes", "dv1.puffin"))
    assert read_mor(spark, mpath, 3003, root).count() == 285


def test_dv_read_plan_shape(spark):
    # plan contract: exactly ONE Arrow-batched decode (MapInPandas
    # over one row per vector), the per-file sequence attach as a
    # broadcast join, and zero row-at-a-time Python anywhere; the
    # delete anti-join is left to AQE (static plan shows sort-merge,
    # runtime may flip it to broadcast)
    from iceberg_tools_spark.iceberg.deletes import DV_DIR, DV_METADATA, read_mor

    plan = (
        read_mor(spark, DV_METADATA, 3003, DV_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_dv_magic_is_the_spec_constant():
    # the v3 spec's deletion-vector magic is the little-endian
    # encoding of 1681511377 (D1 D3 39 64) — what every real engine
    # embeds; a wrong constant would round-trip internally but
    # reject (and be rejected by) spec-compliant files
    assert struct.unpack("<I", DV_MAGIC)[0] == 1681511377
    assert DV_MAGIC == bytes([0xD1, 0xD3, 0x39, 0x64])


def test_delete_where_dv_accepts_keys_dataframe(spark, tmp_path):
    """The v3 DV write path shares the keys-DataFrame victim scan
    (VERDICT r6 #1): same result as the SQL-predicate form."""
    import shutil

    from iceberg_tools_spark.iceberg.deletes import DV_DIR, read_mor
    from iceberg_tools_spark.iceberg.dml import delete_where_dv

    root = str(tmp_path / "t")
    shutil.copytree(DV_DIR, root)
    mp = os.path.join(root, "v3.metadata.json")
    keys = spark.createDataFrame([(i,) for i in range(30, 40)], "id bigint")
    res = delete_where_dv(spark, mp, keys)
    ids = {
        r.id
        for r in read_mor(spark, res["metadata_path"], res["snapshot_id"]).collect()
    }
    assert ids.isdisjoint(range(30, 40))


def test_position_deletes_table_over_dv_fixture(spark):
    # position_deletes metadata table sourced from a v3 DELETION
    # VECTOR: the puffin blob's positions surface one row each,
    # tagged deletion-vector, matching the decoded blob exactly
    from iceberg_tools_spark.iceberg.deletes import (
        DV_DIR,
        DV_METADATA,
        position_deletes_df,
        mor_entries_at,
        _dv_positions_frame,
    )
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    out = position_deletes_df(spark, DV_METADATA, 3003, DV_DIR).collect()
    assert out and all(r["delete_kind"] == "deletion-vector" for r in out)
    assert all(r["delete_file"].endswith(".puffin") for r in out)

    meta = parse_metadata(DV_METADATA)
    _, dels = mor_entries_at(meta, 3003, DV_DIR)
    dv_rows = _dv_positions_frame(
        spark, [e for e in dels if e.get("referenced_data_file")]
    ).collect()
    assert sorted((r["file_path"], r["pos"]) for r in out) == sorted(
        (r["pd_rel"], r["pd_pos"]) for r in dv_rows
    )


def test_position_deletes_table_empty_when_no_deletes(spark):
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA, position_deletes_df

    # snapshot 2002 predates the delete commit: typed empty frame
    df = position_deletes_df(spark, MOR_METADATA, 2002, MOR_DIR)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "file_path", "pos", "delete_file", "delete_kind", "sequence_number",
    ]


def _fresh_v3_table(tmp_path):
    import json

    root = tmp_path / "t"
    (root / "metadata").mkdir(parents=True)
    (root / "data").mkdir()
    meta0 = {
        "format-version": 3,
        "table-uuid": "00000000-0000-0000-0000-00000000e002",
        "location": "file:///tmp/lineage_t",
        "last-sequence-number": 0,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{
            "schema-id": 0, "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "category", "required": False, "type": "string"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}, "snapshots": [], "snapshot-log": [], "metadata-log": [],
    }
    mp = root / "v1.metadata.json"
    mp.write_text(json.dumps(meta0))
    return str(root), str(mp)


def _pq_write(root, rel, ids, cat):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()),
                  "category": pa.array([cat] * len(ids))}),
        f"{root}/{rel}",
    )


def test_row_lineage_counter_continues_after_delete(spark, tmp_path):
    import json

    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.deletes import read_mor_lineage
    from iceberg_tools_spark.iceberg.dml import delete_where_dv

    root, mp = _fresh_v3_table(tmp_path)
    _pq_write(root, "data/X.parquet", [1, 2, 3], "a")
    s1 = append_snapshot(mp, [{"path": "data/X.parquet", "partition": {}}])
    s2 = delete_where_dv(spark, s1["metadata_path"], "id = 2")
    _pq_write(root, "data/Y.parquet", [4, 5], "b")
    s3 = append_snapshot(s2["metadata_path"], [{"path": "data/Y.parquet", "partition": {}}])
    got = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_mor_lineage(spark, s3["metadata_path"], s3["snapshot_id"], root).collect()
    }
    # X's survivors keep ids 0/2; Y continues at next-row-id 3
    # (the DV delete commit added no data rows, so it consumed none)
    assert got == {1: (0, 1), 3: (2, 1), 4: (3, 3), 5: (4, 3)}
    raw = json.loads(open(s3["metadata_path"]).read())
    assert raw["next-row-id"] == 5
    snaps = {s["snapshot-id"]: s for s in raw["snapshots"]}
    assert snaps[s1["snapshot_id"]]["first-row-id"] == 0
    assert snaps[s3["snapshot_id"]]["first-row-id"] == 3
    assert "first-row-id" not in snaps[s2["snapshot_id"]]  # delete-only


def test_row_lineage_null_for_pre_lineage_files(spark, tmp_path):
    # a v2 table upgraded mid-life: files committed before the
    # upgrade have no first_row_id and read as NULL _row_id
    import json
    import shutil

    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor_lineage

    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    mp = str(root / "v2.metadata.json")
    raw = json.loads(open(mp).read())
    raw["format-version"] = 3
    open(mp, "w").write(json.dumps(raw))
    _pq_write(str(root), "data/category=w/Z.parquet", [900, 901], "w")
    s = append_snapshot(
        mp, [{"path": "data/category=w/Z.parquet",
              "partition": {"category": "w", "id_trunc": 900}}]
    )
    rows = read_mor_lineage(spark, s["metadata_path"], s["snapshot_id"], str(root)).collect()
    by_id = {r["id"]: r["_row_id"] for r in rows}
    assert by_id[900] == 0 and by_id[901] == 1  # new file: assigned
    # pre-lineage files: no retroactive ids (id 20 survives the
    # fixture's position deletes, which remove ids 1-10)
    assert 20 in by_id and by_id[20] is None


def test_v2_tables_get_no_lineage_fields(tmp_path):
    import json
    import shutil

    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR

    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    mp = str(root / "v2.metadata.json")
    _pq_write(str(root), "data/category=w/Z.parquet", [900], "w")
    s = append_snapshot(
        mp, [{"path": "data/category=w/Z.parquet",
              "partition": {"category": "w", "id_trunc": 900}}]
    )
    raw = json.loads(open(s["metadata_path"]).read())
    assert "next-row-id" not in raw
    assert all("first-row-id" not in sn for sn in raw["snapshots"])
