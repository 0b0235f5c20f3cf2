"""Product-quantization training kernel (NO ``from __future__
import annotations`` — pandas_udf/mapInPandas resolve type hints at
decoration time, same constraint as minhash_kernel.py).

Trains per-subspace k-means codebooks over a bounded md5-ranked
sample in ONE Arrow task (faiss-style: training is a single-node
operation by design; the sample size is fixed regardless of corpus
size). DETERMINISTIC BY CONSTRUCTION — no RNG anywhere: centroids
initialize from the first ``ksub`` sample rows (the sample itself
is md5-ordered), and every numpy reduction runs in fixed array
order, so identical inputs give bit-identical codebooks on any
host.
"""

import numpy as np
import pandas as pd


def make_pq_encode_kernel(m: int, ksub: int, dsub: int, cbooks, out_cols):
    """mapInPandas kernel: (*out_cols, embedding) corpus rows →
    (*out_cols, codes) — argmin squared distance per subspace
    against ``cbooks`` (the trained codebook tensor, shape
    (m, ksub, dsub), closed over: KB at any corpus size).

    Bit-equivalence with the former engine-side explode → broadcast
    join → min-of-struct form is by construction: the squared
    distance accumulates subspace-element by subspace-element in
    LEFT-FOLD order (acc = (acc + x_i), x_i = (a-b)*(a-b) — the op
    sequence of the JVM ``aggregate(zip_with(...), 0D, acc + x)``
    expression, float inputs widened to double exactly like the JVM
    promotion), and ``argmin``'s first-minimum tie-break equals
    ``min(struct(d2, code))`` because codes ascend 0..ksub-1.
    Pinned by tests/test_similarity.py::test_pq_encode_kernel_matches_engine.
    """

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for mi in range(m):
                sub = X[:, mi * dsub : (mi + 1) * dsub]
                Cm = cbooks[mi]  # (ksub, dsub)
                acc = np.zeros((len(pdf), ksub))
                for i in range(dsub):  # left fold, JVM order
                    dif = sub[:, i : i + 1] - Cm[None, :, i]
                    acc += dif * dif
                codes[:, mi] = acc.argmin(axis=1)
            out = {c: pdf[c].to_numpy() for c in out_cols}
            out["codes"] = [r.tolist() for r in codes]
            yield pd.DataFrame(out)

    return kernel


def make_pq_train_kernel(m: int, ksub: int, iters: int):
    """mapInPandas kernel: (vec_id, embedding) sample rows →
    ``(sub, code, cemb)`` codebook rows (m·ksub of them)."""

    def kernel(batches):
        chunks = []
        for pdf in batches:
            if len(pdf):
                chunks.append(np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]))
        if not chunks:
            yield pd.DataFrame({"sub": [], "code": [], "cemb": []})
            return
        X = np.vstack(chunks)
        d = X.shape[1]
        if d % m:
            raise ValueError(f"dim {d} not divisible into {m} subspaces")
        dsub = d // m
        rows = []
        for mi in range(m):
            sub = X[:, mi * dsub : (mi + 1) * dsub]
            C = sub[:ksub].copy()  # deterministic init: first ksub sample rows
            for _ in range(iters):
                d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for j in range(ksub):
                    pts = sub[assign == j]
                    if len(pts):
                        C[j] = pts.mean(axis=0)
            for j in range(ksub):
                rows.append({"sub": mi, "code": j, "cemb": C[j].tolist()})
        yield pd.DataFrame(rows)

    return kernel
