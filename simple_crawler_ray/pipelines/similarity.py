"""Similarity search over the ``embeddings`` table (list<float> column).

- ``s1_knn_bruteforce``: exact cosine top-k — per-batch numpy matmul of the
  corpus against a broadcast query matrix (the baseline; at 100 TB the
  corpus streams through ``map_batches`` while the small query set rides
  along via ``ray.put``). DuckDB-oracle-checked (rank-exact, float64 math
  on both sides).
- ``s2_ann_lsh``: the scale path — random-hyperplane LSH buckets; each
  query only scans its own bucket (approximate; rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

__all__ = ["s1_knn_bruteforce", "s2_ann_lsh"]

_N_QUERIES = 5
_K = 10


def _emb_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def s1_knn_bruteforce(sf_dir: str):
    """Exact top-k cosine neighbors of query vectors (vec_id < 5) over the
    whole table. Output (query_id, neighbor_id, rank), self excluded,
    ties broken by neighbor_id — rank-exact vs the SQL oracle."""
    path = f"{sf_dir}/embeddings.parquet"
    queries = (
        rd.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < _N_QUERIES)
        .to_pandas()
    )
    q_ids = queries["vec_id"].to_numpy()
    q_mat = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_norm))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qn = ray.get(q_ref)
        m = _emb_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn @ m.T  # (nq, nb)
        ids = batch["vec_id"].to_numpy()
        rows = []
        for qidx, qid in enumerate(qi):
            for j, nid in enumerate(ids):
                if nid == qid:
                    continue
                rows.append((int(qid), int(nid), float(sims[qidx, j])))
        df = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])
        # keep only per-batch top-k per query (partial top-k → tiny merge)
        return (
            df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
            .groupby("query_id", as_index=False)
            .head(_K)
        )

    partials = (
        rd.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    merged = (
        partials.sort_values(
            ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id", as_index=False)
        .head(_K)
        .reset_index(drop=True)
    )
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    return merged[["query_id", "neighbor_id", "rank"]].astype("int64")


def s2_ann_lsh(sf_dir: str, n_planes: int = 6):
    """Approximate NN via random-hyperplane LSH: bucket = sign-bit code of
    the embedding under ``n_planes`` fixed hyperplanes; each query scans
    only its bucket (∼1/2^n of the corpus). Output (query_id, neighbor_id)
    sets; recall < 1 by construction → rows-only check."""
    path = f"{sf_dir}/embeddings.parquet"
    head = rd.read_parquet(path, columns=["embedding"]).take(1)
    dim = len(head[0]["embedding"])
    rng = np.random.RandomState(13)
    planes = rng.randn(n_planes, dim)
    planes_ref = ray.put(planes)

    def code(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        m = _emb_matrix(batch)
        bits = (m @ pl.T) > 0
        codes = bits @ (1 << np.arange(n_planes))
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype("int64"),
                "bucket": codes.astype("int64"),
                "embedding": batch["embedding"],
            }
        )

    coded = rd.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        code, batch_format="pandas", batch_size=4096
    )

    def bucket_knn(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        qmask = ids < _N_QUERIES
        if not qmask.any():
            return pd.DataFrame({"query_id": [], "neighbor_id": []}).astype("int64")
        m = _emb_matrix(group)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m[qmask] @ m.T
        rows = []
        for qi, qid in enumerate(ids[qmask]):
            order = np.argsort(-sims[qi])
            picked = [int(ids[j]) for j in order if ids[j] != qid][:_K]
            rows.extend((int(qid), nid) for nid in picked)
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id"]).astype("int64")

    return (
        coded.groupby("bucket")
        .map_groups(bucket_knn, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
