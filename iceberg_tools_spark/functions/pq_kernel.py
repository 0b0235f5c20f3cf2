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
