"""Driver-contract checks: every queries() entry runs at sf0.001; entries
with an oracle_sql() are compared against DuckDB exactly (the same
row-count/schema/value comparison the driver applies)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tools.check_oracles import TABLES, compare, to_pandas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_query_and_oracle_keys_consistent():
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    # the rows-only set is exactly the non-SQL-expressible ops
    assert set(qs) - set(sqls) == {
        "c1_crawl_order",
        "c2_crawl_seen",
        "c3_crawl_urls_out",
        "c4_sitemaps_out",
        "d2_minhash_lsh",
        "d3_simhash",
        "d3b_simhash_neardup",
        "d5b_embedding_lsh_pairs",
        "e9_approx_distinct_users",
        "s2_ann_lsh",
        "s3_ann_ivf",
        "s3b_ann_ivf_partitioned",
    }


_ORACLE_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(ray_session, con, name):
    ours = to_pandas(entrymod.queries()[name](SF_DIR))
    oracle = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare(name, ours, oracle)
    assert not problems, problems


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    for name in ("d2_minhash_lsh", "d3_simhash", "s2_ann_lsh"):
        df = to_pandas(qs[name](SF_DIR))
        assert df is not None


def test_q4_join_regimes_agree(ray_session):
    """q4's size-switched join: the broadcast-build regime (default at
    test scale) and the native hash-partitioned Dataset.join regime
    (forced via broadcast_max_build_rows=0) must produce identical
    output."""
    from simple_crawler_ray.pipelines.relational import q4_priority_revenue

    bcast = q4_priority_revenue(SF_DIR)
    native = q4_priority_revenue(SF_DIR, broadcast_max_build_rows=0)
    key = "o_orderpriority"
    pd.testing.assert_frame_equal(
        bcast.sort_values(key).reset_index(drop=True),
        native.sort_values(key).reset_index(drop=True),
    )


def test_d4b_unbounded_superset(ray_session):
    """d4b with the oracle bound lifted must reproduce every bounded pair
    (the bound is a filter, not a semantic knob) and mine strictly more
    pairs over the full 500-doc corpus."""
    from simple_crawler_ray.pipelines.dedup import (
        d4_ngram_jaccard_pairs,
        d4b_ngram_jaccard_dist,
    )

    bounded = d4_ngram_jaccard_pairs(SF_DIR)
    full = to_pandas(d4b_ngram_jaccard_dist(SF_DIR, max_doc_id=None))
    assert set(zip(bounded["doc_a"], bounded["doc_b"])) <= set(
        zip(full["doc_a"], full["doc_b"])
    )
    assert len(full) > len(bounded)


def test_s2_ann_recall_floor(ray_session):
    """Multi-probe LSH must reach recall@10 ≥ 0.9 against the exact
    brute-force top-k on the same table."""
    from simple_crawler_ray.pipelines.similarity import (
        s1_knn_bruteforce,
        s2_ann_lsh,
    )

    exact = s1_knn_bruteforce(SF_DIR)
    ann = s2_ann_lsh(SF_DIR)
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(ann[ann["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_d3b_finds_injected_neardups(ray_session):
    """The banded-Hamming search must recover the deterministically
    injected near-duplicates (doc_id → doc_id + 1,000,000, text perturbed
    by one token): any pair within the Hamming radius shares a band by
    pigeonhole, so every injected pair whose signatures are ≤ max_hamming
    apart MUST appear."""
    import numpy as np

    from simple_crawler_ray.pipelines.dedup import d3b_simhash_neardup

    pairs = d3b_simhash_neardup(SF_DIR)
    assert len(pairs) > 0
    assert (pairs["hamming"] <= 3).all()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()
    injected = pairs[pairs["doc_b"] == pairs["doc_a"] + 1_000_000]
    # one perturbing token over a ~200-token doc flips few signature bits:
    # a healthy share of the injected copies must be recovered
    assert len(injected) >= 25
    # and recovered pairs are genuine near-dups of their own source
    assert (injected["doc_a"] % 2 == 0).all()


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert out.num_rows > 0
    assert out.schema.names == [
        "seq",
        "url",
        "depth",
        "parent_url",
        "req_status",
        "crawl_status",
    ]


def test_d2_join_and_broadcast_verify_agree(ray_session, monkeypatch):
    """The verify's two execution strategies (broadcast fast path vs
    two-hash-join shuffle) must return identical pairs."""
    from simple_crawler_ray.pipelines import dedup

    sf = "/root/testdata/sf0.01"
    broadcast = dedup.d2_minhash_lsh(sf)
    monkeypatch.setattr(dedup, "_D2_JOIN_MIN_PAIRS", -1)
    monkeypatch.setattr(dedup, "_PAYLOAD_BROADCAST_MAX_BYTES", -1)
    joined = dedup.d2_minhash_lsh(sf)
    assert broadcast.values.tolist() == joined.values.tolist()
    assert len(broadcast) > 0


# ---- golden fixtures (round-2 VERDICT item #9) --------------------------
# Exact expected outputs for the rows-only simhash ops on a tiny fixed
# corpus, precomputed from the implementation at round 3 and frozen: any
# refactor that silently changes signature math or banding now fails
# loudly instead of slipping through the no-oracle blind spot.

_GOLDEN_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river shore"),
    (2, "machine learning models require large amounts of training data to generalize"),
    (3, "machine learning models require huge amounts of training data to generalize"),
    (4, "completely unrelated text about cooking pasta with garlic and olive oil"),
    (5, "the weather today is sunny with a gentle breeze from the north"),
]

_GOLDEN_D3 = {
    0: "b8de46c2ef617466",
    1: "b8dc4782ef237636",
    2: "5a36d8ae25e8b0f6",
    3: "7a36daae25e8b2f6",
    4: "07c794838f933b3c",
    5: "af9ef42fb901a704",
}

# (doc_a, doc_b, hamming); 1000002 is d3b's own injected perturbation of
# doc 2 (the recovery self-check built into the op)
_GOLDEN_D3B = [(2, 3, 3), (2, 1000002, 2)]


@pytest.fixture(scope="module")
def golden_corpus_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("golden_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in _GOLDEN_DOCS], pa.int64()),
                "text": pa.array([t for _, t in _GOLDEN_DOCS], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_d3_simhash_golden(ray_session, golden_corpus_dir):
    out = to_pandas(entrymod.queries()["d3_simhash"](golden_corpus_dir))
    got = dict(zip(out["doc_id"].astype(int), out["simhash"]))
    assert got == _GOLDEN_D3


def test_d3b_neardup_golden(ray_session, golden_corpus_dir):
    out = to_pandas(entrymod.queries()["d3b_simhash_neardup"](golden_corpus_dir))
    got = sorted(
        (int(a), int(b), int(h))
        for a, b, h in zip(out["doc_a"], out["doc_b"], out["hamming"])
    )
    assert got == _GOLDEN_D3B


def test_s3_ann_ivf_recall_floor(ray_session):
    """IVF (k-means quantizer) must reach recall@10 >= 0.9 against the
    exact brute-force top-k on the same table."""
    from simple_crawler_ray.pipelines.similarity import (
        s1_knn_bruteforce,
        s3_ann_ivf,
    )

    exact = s1_knn_bruteforce(SF_DIR)
    ann = s3_ann_ivf(SF_DIR)
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(ann[ann["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_s3b_partitioned_matches_streamed(ray_session, tmp_path):
    """The materialized list-partitioned IVF must return EXACTLY the
    streamed s3's output: same trainer, probe policy, scorer and merge —
    the only difference is WHERE the list assignment lives (stored
    per-list Parquet vs per-batch recompute), which must not change a
    single neighbor. Also asserts the read actually pruned: the index
    files opened are only the probed lists."""
    import os
    import shutil

    import pandas as pd

    from simple_crawler_ray.pipelines import similarity as sim

    # force a fresh index build in a scratch root so caching is exercised
    old_root = sim._IVF_INDEX_ROOT
    sim._IVF_INDEX_ROOT = str(tmp_path / "ivf")
    try:
        streamed = sim.s3_ann_ivf(SF_DIR)
        part1 = sim.s3b_ann_ivf_partitioned(SF_DIR)  # builds the index
        part2 = sim.s3b_ann_ivf_partitioned(SF_DIR)  # reuses it
        pd.testing.assert_frame_equal(part1, streamed)
        pd.testing.assert_frame_equal(part2, streamed)
        idx_dirs = os.listdir(sim._IVF_INDEX_ROOT)
        assert len(idx_dirs) == 1
        files = [
            f for f in os.listdir(os.path.join(sim._IVF_INDEX_ROOT, idx_dirs[0]))
            if f.startswith("list=")
        ]
        assert files, "index wrote no per-list files"
    finally:
        shutil.rmtree(sim._IVF_INDEX_ROOT, ignore_errors=True)
        sim._IVF_INDEX_ROOT = old_root


def test_e4_heavy_hitters_sketch_bound(ray_session, tmp_path):
    """Misra-Gries candidate stage must recover the exact top-k on a
    skewed stream whose DISTINCT-user count far exceeds the sketch's
    counter budget — the regime the sketch exists for (bounded state,
    not bounded cardinality)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_crawler_ray.pipelines.events import e4_heavy_hitters

    rng = np.random.default_rng(7)
    # 40k events: 10 heavy users (~1k events each) buried in 20k
    # singleton/doubleton users — distinct users (~20k) >> counters (256)
    heavy = np.repeat(np.arange(10), 1000)
    tail = rng.integers(100, 30_000, size=30_000)
    users = np.concatenate([heavy, tail])
    rng.shuffle(users)
    d = tmp_path / "hh"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "value": pa.array(np.ones(len(users)), pa.float64()),
                "ts": pa.array(
                    pd.date_range("2024-01-01", periods=len(users), freq="s")
                ),
                "event_type": pa.array(["x"] * len(users), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    out = e4_heavy_hitters(str(d))
    exact = (
        pd.Series(users)
        .value_counts()
        .rename_axis("user_id")
        .reset_index(name="n")
        .sort_values(["n", "user_id"], ascending=[False, True])
        .head(10)
    )
    assert out["user_id"].tolist() == exact["user_id"].tolist()
    assert out["n_events"].tolist() == exact["n"].tolist()

    # force the hierarchical MG-merge rounds to actually execute: tiny
    # sketch batches × small counter budget → stage-1 survivors (~20
    # batches × 64) far exceed the 8×counters collect threshold, so the
    # tree reduction must fold them — and the exact top-k must survive
    # the merge decrements (the mergeable-summaries bound)
    out2 = e4_heavy_hitters(str(d), counters=64, sketch_batch_rows=2048)
    assert out2["user_id"].tolist() == exact["user_id"].tolist()
    assert out2["n_events"].tolist() == exact["n"].tolist()


def test_d5b_recovers_injected_neardups(ray_session):
    """The LSH-bucketed embedding near-dup path must recover the injected
    perturbed copies (cosine ≈ 0.98 to their sources) and emit no pair
    below its exact-cosine threshold."""
    from simple_crawler_ray.pipelines.dedup import _D5B_INJECT, d5b_embedding_lsh_pairs

    out = d5b_embedding_lsh_pairs(SF_DIR)
    assert (out["cosine"] >= 0.85).all()
    got = set(zip(out["vec_id_a"], out["vec_id_b"]))
    expected = {(i, 1_000_000 + i) for i in range(_D5B_INJECT)}
    recovered = len(expected & got) / len(expected)
    assert recovered >= 0.9, (recovered, sorted(got)[:10])


def test_d5b_join_and_broadcast_verify_agree(ray_session, monkeypatch):
    """d5b's shared verify (``_pair_verify``) must return identical pairs
    through the broadcast fast path and the two-hash-join scale path."""
    from simple_crawler_ray.pipelines import dedup

    broadcast = dedup.d5b_embedding_lsh_pairs(SF_DIR)
    monkeypatch.setattr(dedup, "_D2_JOIN_MIN_PAIRS", -1)
    monkeypatch.setattr(dedup, "_PAYLOAD_BROADCAST_MAX_BYTES", -1)
    joined = dedup.d5b_embedding_lsh_pairs(SF_DIR)
    assert broadcast.values.tolist() == joined.values.tolist()
    assert len(broadcast) > 0


def test_e9_hll_error_bound(ray_session, con):
    """HyperLogLog estimate must land within 3σ (σ = 1.04/√256 ≈ 6.5%)
    of the exact distinct count at both test scales."""
    from simple_crawler_ray.pipelines.events import e9_approx_distinct_users

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        est = int(
            e9_approx_distinct_users(sf)["approx_distinct_users"].iloc[0]
        )
        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        rel_err = abs(est - exact) / exact
        assert rel_err <= 3 * 1.04 / 16, (sf, est, exact, rel_err)


def test_d6_distributed_matches_driver_unionfind(ray_session):
    """d6's two regimes — driver union-find (small graphs) and the
    distributed min-label propagation loop — must produce identical
    clusters; driver_max_nodes=0 forces the distributed path."""
    from simple_crawler_ray.pipelines.dedup import d6_neardup_clusters

    fast = to_pandas(d6_neardup_clusters(SF_DIR))
    dist = to_pandas(d6_neardup_clusters(SF_DIR, driver_max_nodes=0))
    dist = dist.sort_values("doc_id").reset_index(drop=True)
    assert fast.values.tolist() == dist.values.tolist()
    assert (fast["cluster_size"] > 1).any()  # real clusters exist


def test_s2_hash_set_probes_match_dense(ray_session, monkeypatch):
    """The hash-set probe representation (large-n_planes path) must give
    exactly the dense bool-table answer at the same n_planes, and must
    run at the n_planes≈24 scale the dense table can't afford."""
    from simple_crawler_ray.pipelines import similarity

    dense = similarity.s2_ann_lsh(SF_DIR)
    monkeypatch.setattr(similarity, "_S2_DENSE_MAX_PLANES", 0)
    sets = similarity.s2_ann_lsh(SF_DIR)
    assert dense.values.tolist() == sets.values.tolist()
    assert len(dense) > 0

    # set path at n_planes=24: a 2^24-entry bool row per query would be
    # 16 MB/query; the probe arrays are ~2.3k codes. Smoke + shape only —
    # 24 planes over a toy corpus legitimately prunes recall.
    big = similarity.s2_ann_lsh(SF_DIR, n_planes=24)
    assert list(big.columns) == ["query_id", "neighbor_id"]


def test_connected_components_clusters_d3b_pairs(ray_session):
    """The CC core is input-agnostic: d3b's SimHash near-dup pair table
    must cluster through it, putting every injected (i, i+1_000_000)
    near-dup pair in one component with rep = i."""
    import pandas as pd
    import ray.data as rd

    from simple_crawler_ray.pipelines.dedup import (
        connected_components,
        d3b_simhash_neardup,
    )

    pairs = d3b_simhash_neardup(SF_DIR)
    nodes = pd.DataFrame(
        {
            "doc_id": pd.concat(
                [pairs["doc_a"], pairs["doc_b"]], ignore_index=True
            ).drop_duplicates()
        }
    )
    out = to_pandas(
        connected_components(pairs[["doc_a", "doc_b"]], rd.from_pandas(nodes))
    ).set_index("doc_id")
    injected = pairs[pairs["doc_b"] == pairs["doc_a"] + 1_000_000]
    assert len(injected) > 0
    for a, b in zip(injected["doc_a"], injected["doc_b"]):
        assert out.loc[a, "cluster_rep"] == out.loc[b, "cluster_rep"]
        assert out.loc[b, "cluster_size"] >= 2


def test_connected_components_long_chain_distributed(ray_session):
    """Pointer jumping: a duplicate CHAIN much deeper than the old
    16-round propagation cap must converge in the distributed regime and
    match the driver union-find exactly (regression: the capped
    min-label loop raised AssertionError on a 26-node chain)."""
    import pandas as pd
    import numpy as np
    import ray.data as rd

    from simple_crawler_ray.pipelines.dedup import connected_components

    for n in (26, 300):
        pairs = pd.DataFrame(
            {
                "doc_a": np.arange(n - 1, dtype=np.int64),
                "doc_b": np.arange(1, n, dtype=np.int64),
            }
        )
        nodes = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
        dist = to_pandas(
            connected_components(
                pairs, rd.from_pandas(nodes.copy()), driver_max_nodes=0
            )
        ).sort_values("doc_id").reset_index(drop=True)
        drv = connected_components(
            pairs, rd.from_pandas(nodes.copy()), driver_max_nodes=10**9
        ).sort_values("doc_id").reset_index(drop=True)
        assert dist.values.tolist() == drv.values.tolist()
        assert (dist["cluster_rep"] == 0).all()
        assert (dist["cluster_size"] == n).all()


def test_connected_components_drops_out_of_universe_edges(ray_session):
    """Edges naming endpoints outside nodes_ds propose nothing and emit
    no label rows, identically in both regimes (contract: endpoints ⊆
    nodes_ds)."""
    import pandas as pd
    import numpy as np
    import ray.data as rd

    from simple_crawler_ray.pipelines.dedup import connected_components

    nodes = pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype=np.int64)})
    pairs = pd.DataFrame(
        {
            "doc_a": np.array([0, 1, 99], dtype=np.int64),
            "doc_b": np.array([99, 2, 2], dtype=np.int64),
        }
    )
    for dmn in (0, 10**9):
        out = to_pandas(
            connected_components(
                pairs, rd.from_pandas(nodes.copy()), driver_max_nodes=dmn
            )
        ).sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [0, 1, 2]
        assert out["cluster_rep"].tolist() == [0, 1, 1]
        assert out["cluster_size"].tolist() == [1, 2, 2]


def test_t11_quota_sample_layout_invariant(ray_session, con):
    """The quota sample is a pure function of (doc_id, lang): forcing many
    tiny batches (so the per-batch partial top-k and the driver merge both
    do real work) must produce the identical sample as the oracle and as
    the default layout."""
    from simple_crawler_ray.pipelines.textops import t11_quota_sample

    default = t11_quota_sample(SF_DIR)
    tiny = t11_quota_sample(SF_DIR, batch_size=16)
    pd.testing.assert_frame_equal(default, tiny)
    oracle = con.execute(entrymod.oracle_sql()["t11_quota_sample"]).fetchdf()
    problems = compare("t11_tiny", tiny, oracle)
    assert not problems, problems
    assert (tiny.groupby("lang")["doc_id"].size() == 4).all()


def test_q12b_within_one_bin_of_exact(ray_session):
    """The histogram estimate is the lower edge of the bin holding the
    target rank, so it must sit within one bin width BELOW-or-AT the
    exact quantile (which lives inside that bin)."""
    from simple_crawler_ray.pipelines.relational import (
        q12_price_quantiles,
        q12b_approx_quantiles,
    )

    exact = q12_price_quantiles(SF_DIR).iloc[0]
    approx = q12b_approx_quantiles(SF_DIR, n_bins=256).iloc[0]
    import pyarrow.parquet as pq

    col = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]
    )["o_totalprice"].to_numpy()
    w = (col.max() - col.min()) / 256
    for p in ("p50", "p90", "p99"):
        assert approx[p] <= exact[p] + 1e-9, (p, approx[p], exact[p])
        assert exact[p] - approx[p] <= w + 1e-9, (p, approx[p], exact[p], w)
    assert int(approx["n_orders"]) == int(exact["n_orders"])


def test_q14b_within_one_bin_of_exact_per_group(ray_session):
    """Each group's histogram estimate is the lower edge of the bin
    holding that group's target rank — within one (global) bin width
    below-or-at the group's exact quantile."""
    from simple_crawler_ray.pipelines.relational import (
        q14_grouped_quantiles,
        q14b_grouped_approx_quantiles,
    )

    exact = q14_grouped_quantiles(SF_DIR).set_index("o_orderpriority")
    approx = q14b_grouped_approx_quantiles(SF_DIR, n_bins=256).set_index(
        "o_orderpriority"
    )
    import pyarrow.parquet as pq

    col = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]
    )["o_totalprice"].to_numpy()
    w = (col.max() - col.min()) / 256
    assert set(approx.index) == set(exact.index)
    for prio in exact.index:
        for p in ("p50", "p90"):
            a, e = approx.loc[prio, p], exact.loc[prio, p]
            assert a <= e + 1e-9, (prio, p, a, e)
            assert e - a <= w + 1e-9, (prio, p, a, e, w)
        assert int(approx.loc[prio, "n_orders"]) == int(exact.loc[prio, "n_orders"])
