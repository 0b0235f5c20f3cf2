"""Single-task Lloyd trainer for the IVF index — Arrow-batched,
fold-order-exact.

Real IVF libraries (faiss et al.) train k-means on a BOUNDED sample
on one node and distribute only the assignment; the previous
engine-side trainer ran each Lloyd round as its own Spark job
(crossJoin + two shuffles + a blocking localCheckpoint), which at
sf0.1 cost ~1 s of scheduling per round for a 50·k-row sample that
fits trivially in one Arrow batch. This kernel runs ALL rounds in
one `mapInPandas` task over the sample and emits the final
centroids; corpus assignment stays a distributed map-side argmin
(`similarity._ivf_assign`).

Bit-exactness contract (the DuckDB oracle replays the identical
computation, so every float op must match IEEE-for-IEEE):

* dot products / sum-of-squares are strict LEFT FOLDS over
  dimensions — `acc += A[:, j] * C[j]` sequentially over j performs
  the same addition sequence per element as the engines'
  ``aggregate(..., 0.0D, (acc, v) -> acc + v)`` (see
  functions/vectors.py);
* d2 is evaluated in the engine expression's association order:
  ``(ss − 2·dot) + css``;
* argmin ties break toward the LOWEST surviving cell id (the
  engines' ``ORDER BY d2, cell``) — centroid rows are kept sorted
  by cell id so ``np.argmin``'s first-minimum rule agrees;
* Lloyd means are the 2⁻³³-quantized deterministic mean:
  ``floor(val·2³³)`` summed in exact int64 (np.add.at is unordered
  but integer addition is associative), then ONE int→double cast
  and ONE double division — the same two roundings both engines
  perform;
* empty cells drop out and surviving cells KEEP their original ids
  (cell id is the group key, never re-indexed).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def _fold_dots(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n×k) pairwise dots as a left fold over dimensions."""
    acc = np.zeros((E.shape[0], C.shape[0]))
    for j in range(E.shape[1]):
        acc += E[:, j, None] * C[None, :, j]
    return acc


def _fold_ss(C: np.ndarray) -> np.ndarray:
    """Per-row Σx² as a left fold over dimensions."""
    acc = np.zeros(C.shape[0])
    for j in range(C.shape[1]):
        acc += C[:, j] * C[:, j]
    return acc


def make_lloyd_kernel(k: int, rounds: int, qscale: float):
    """Build the mapInPandas trainer.

    Input partition: the md5-ranked training sample with columns
    (mk, vec_id, embedding, ss) — at most 50·k rows by construction,
    coalesced to ONE partition by the caller. Output rows:
    (cell, cemb, css) for every non-empty cell.
    """

    def train(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        # the engines' ORDER BY mk, vec_id (md5 hex strings compare
        # bytewise in both; vec_id makes the sort total)
        df = df.sort_values(["mk", "vec_id"], kind="mergesort", ignore_index=True)
        E = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        ss = df["ss"].to_numpy(dtype=np.float64)
        n, dims = E.shape

        # seeds: first k sample rows, cell id = rank − 1
        kk = min(k, n)
        cell_ids = np.arange(kk, dtype=np.int64)
        C = E[:kk].copy()
        css = ss[:kk].copy()

        for _ in range(rounds):
            # assign: argmin over (ss − 2·dot) + css, first-minimum
            # tie-break = lowest cell id (rows of C sorted by id)
            d2 = (ss[:, None] - 2.0 * _fold_dots(E, C)) + css[None, :]
            a = np.argmin(d2, axis=1)
            # quantized deterministic mean per surviving cell
            Q = np.floor(E * qscale).astype(np.int64)
            sums = np.zeros((C.shape[0], dims), dtype=np.int64)
            np.add.at(sums, a, Q)
            counts = np.bincount(a, minlength=C.shape[0]).astype(np.int64)
            keep = counts > 0
            cell_ids = cell_ids[keep]
            C = sums[keep].astype(np.float64) / (
                counts[keep].astype(np.float64)[:, None] * qscale
            )
            css = _fold_ss(C)

        yield pd.DataFrame(
            {
                "cell": cell_ids,
                "cemb": [row.tolist() for row in C],
                "css": css,
            }
        )

    return train
