"""Sequence packing: group documents into fixed token-budget packs
for training (the consumer of ``token_count_histogram``'s curve).

Global optimal bin packing is NP-hard and inherently sequential —
the scalable formulation is partitioned packing: documents are
hash-assigned to ``n_shards`` independent shards (uniform md5 key →
no skew), and each shard packs its documents greedily
(first-fit-decreasing over a deterministic order) inside one
``applyInPandas`` group. Packs never span shards, so the operator
parallelizes perfectly; the waste vs a global packer is bounded by
one partially-filled pack per shard — negligible when each shard holds
thousands of documents (at 100 TB choose n_shards ≈ executors×4).

Everything is deterministic: shard = md5(doc_id), order = (token
count desc, doc_id), so re-runs produce byte-identical packs.

Oracle: rows-only (the greedy fold is not SQL-expressible);
``tests/test_packing.py`` asserts the packing invariants instead
(every doc packed exactly once, no pack over budget, deterministic,
waste bound).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import md5_i64
from ..sources.readers import load_table

TOKEN_BUDGET = 512
N_SHARDS = 32

PACK_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_fill", T.LongType()),
    ]
)


def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing within one shard. Docs longer than the
    budget get a singleton (truncation is the caller's policy)."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    shard = int(pdf["shard"].iloc[0])
    fills: list[int] = []
    assign: list[int] = []
    for n in pdf["n_tokens"]:
        n = int(n)
        placed = False
        for i in range(len(fills)):
            if fills[i] + n <= TOKEN_BUDGET:
                fills[i] += n
                assign.append(i)
                placed = True
                break
        if not placed:
            fills.append(n)
            assign.append(len(fills) - 1)
    return pd.DataFrame(
        {
            "shard": shard,
            "pack_id": [shard * 1_000_000 + a for a in assign],
            "doc_id": pdf["doc_id"].values,
            "n_tokens": pdf["n_tokens"].values,
            "pack_fill": [fills[a] for a in assign],
        }
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    shard = (md5_i64(F.col("doc_id").cast("string"), "pack") % N_SHARDS).cast("int")
    staged = d.select("doc_id", n_tok.alias("n_tokens"), shard.alias("shard"))
    return (
        staged.groupBy("shard")
        .applyInPandas(_pack_shard, PACK_SCHEMA)
        .orderBy("shard", "pack_id", "doc_id")
    )
