"""Bloom filter + sharded seen-set (SADD parity, cache.py:91-97 /
reference tests/test_cache.py:71-86)."""

from simple_crawler_ray.state.bloom import BloomFilter


def test_bloom_membership():
    bf = BloomFilter(num_bits=1 << 12)
    keys = [f"https://h{i}.example/p{i}".encode() for i in range(100)]
    for k in keys:
        bf.add(k)
    assert all(k in bf for k in keys)
    # false-positive rate sane on fresh keys
    fp = sum(f"https://other{i}.example".encode() in bf for i in range(1000))
    assert fp < 50


def test_bloom_serialize_roundtrip():
    bf = BloomFilter(num_bits=1 << 12)
    bf.add(b"abc")
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert b"abc" in bf2
    assert b"def" not in bf2


def test_bloom_merge():
    a, b = BloomFilter(num_bits=1 << 12), BloomFilter(num_bits=1 << 12)
    a.add(b"x")
    b.add(b"y")
    a.merge(b)
    assert b"x" in a and b"y" in a


def test_bloom_digest_kernels_match_bytes_api():
    """The vectorized digest path must place keys at the same positions as
    the byte-key API would, and never produce false negatives."""
    import hashlib

    import numpy as np

    from simple_crawler_ray.state.seen import _digest_matrix

    bf = BloomFilter(num_bits=1 << 12)
    keys = [hashlib.sha1(f"k{i}".encode()).digest() for i in range(200)]
    bf.add_digests(_digest_matrix(keys))
    assert bf.contains_digests(_digest_matrix(keys)).all()
    fresh = [hashlib.sha1(f"other{i}".encode()).digest() for i in range(1000)]
    assert bf.contains_digests(_digest_matrix(fresh)).sum() < 50
    assert isinstance(bf.contains_digests(np.zeros((0, 20), dtype=np.uint8)).sum(), np.integer)


def test_push_drain_admission(ray_session):
    """Distributed-admission primitives: pushes dedup exactly (including
    duplicates within one push and across pushes), drain returns admitted
    rows once and resets."""
    import pyarrow as pa

    from simple_crawler_ray.state.seen import ShardedSeenSet, url_key

    pool = ShardedSeenSet(num_shards=2, num_bits=1 << 12)

    def cand_table(urls):
        from simple_crawler_ray.functions.urlkit import host_of, shard_of

        return pa.table(
            {
                "url": pa.array(urls),
                "host": pa.array([host_of(u) for u in urls]),
                "depth": pa.array([1] * len(urls), pa.int32()),
                "parent_url": pa.array([""] * len(urls)),
                "shard": pa.array(
                    [shard_of(u, 2, None) for u in urls], pa.int32()
                ),
                "key": pa.array([url_key(u) for u in urls], pa.binary()),
            }
        )

    import ray

    urls = [f"https://h{i % 3}.example/p{i}" for i in range(10)]
    ray.get(pool.push_candidates(cand_table(urls + urls[:4])))  # intra-push dupes
    ray.get(pool.push_candidates(cand_table(urls[:6])))  # cross-push dupes
    admitted, received = pool.drain_admitted()
    assert received == 20  # 14 + 6
    assert sorted(admitted["url"].to_pylist()) == sorted(urls)
    assert "key" not in admitted.schema.names
    # drain reset: nothing left
    again, received2 = pool.drain_admitted()
    assert again is None and received2 == 0
    # the seen set retains everything
    assert not any(pool.admit(urls))
    pool.shutdown()


def test_candidate_push_filter_epochs(ray_session):
    """Worker-persistent push filter: keys suppress re-emission only after
    an explicit post-ack commit (a retried task whose push failed must
    re-emit); a new epoch resets the filter."""
    import pyarrow as pa

    from simple_crawler_ray.stages.extract import candidate_batch, commit_pushed_keys

    batch = pa.table(
        {
            "url": pa.array(["https://h.example/parent"]),
            "linked_urls": pa.array([["https://h.example/a", "https://h.example/b"]]),
        }
    )
    depth = {"https://h.example/parent": 0}
    first = candidate_batch(batch, depth_ref=depth, push_epoch="e1")
    assert first.num_rows == 2
    # no commit yet (models a task whose shard push failed before ack):
    # a retry MUST re-emit the same candidates
    retry = candidate_batch(batch, depth_ref=depth, push_epoch="e1")
    assert retry.num_rows == 2
    commit_pushed_keys("e1", first["key"].to_pylist())
    second = candidate_batch(batch, depth_ref=depth, push_epoch="e1")
    assert second.num_rows == 0  # same epoch, acked → already pushed
    fresh = candidate_batch(batch, depth_ref=depth, push_epoch="e2")
    assert fresh.num_rows == 2  # new crawl/resume → reset
    commit_pushed_keys("e1", first["key"].to_pylist())  # stale-epoch commit: no-op
    assert candidate_batch(batch, depth_ref=depth, push_epoch="e2").num_rows == 2


def test_sharded_seen_set(ray_session):
    from simple_crawler_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(num_shards=2, num_bits=1 << 12)
    urls = [f"https://h{i % 3}.example/p{i}" for i in range(20)]
    first = seen.admit(urls)
    assert all(first)
    second = seen.admit(urls)  # SADD second call → False (test_cache.py:71-86)
    assert not any(second)
    assert seen.total() == 20
    assert seen.contains(urls[:5]) == [True] * 5
    assert seen.contains(["https://new.example/x"]) == [False]

    # snapshot/restore round-trip into a fresh pool
    snaps = seen.snapshots()
    seen2 = ShardedSeenSet(num_shards=2, num_bits=1 << 12)
    seen2.restore(snaps)
    assert seen2.total() == 20
    assert not any(seen2.admit(urls[:3]))


def test_snapshot_version_refused(ray_session):
    """A pre-versioning (or future-version) seen snapshot must be refused
    at restore, not silently loaded with mismatched key types."""
    import pickle

    import pytest
    import ray

    from simple_crawler_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(num_shards=1, num_bits=1 << 12)
    seen.admit(["https://h.example/a"])
    good = seen.snapshots()[0]
    state = pickle.loads(good)
    assert state["version"] == 2

    # v1-style snapshot: no version field, exact set of URL STRINGS
    legacy = pickle.dumps({"bloom": state["bloom"], "exact": {"https://h.example/a"}})
    seen2 = ShardedSeenSet(num_shards=1, num_bits=1 << 12)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        seen2.restore([legacy])
    seen.shutdown()
    seen2.shutdown()


def test_truncated_flag_exit_reason(ray_session, small_corpus_dir, tmp_path):
    """A crawl whose frontier empties during the FINAL allowed round is
    'complete', not 'truncated' (exit reason, not r vs max_rounds)."""
    from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl

    def run(tag, max_rounds):
        return crawl(
            CrawlConfig(
                corpus_dir=small_corpus_dir,
                out_dir=str(tmp_path / tag),
                seed_urls=["https://host0.example"],
                max_pages=None,
                num_seen_shards=2,
                num_buckets=8,
                max_rounds=max_rounds,
            )
        )

    free = run("free", 1000)
    assert free.metrics["totals"]["truncated"] is False
    # same crawl with max_rounds == the exact number of rounds it needs:
    # the frontier empties during the last allowed round → still complete
    exact = run("exact", free.rounds)
    assert exact.rounds == free.rounds
    assert exact.metrics["totals"]["truncated"] is False
    assert exact.order.equals(free.order)
    # one round fewer genuinely truncates
    if free.rounds > 1:
        cut = run("cut", free.rounds - 1)
        assert cut.metrics["totals"]["truncated"] is True


def test_spillable_digest_store_semantics(tmp_path):
    """Membership stays exact across hot→run spills and run merges."""
    import hashlib

    from simple_crawler_ray.state.digest_store import SpillableDigestStore

    st = SpillableDigestStore(
        spill_threshold=10, spill_dir=str(tmp_path / "runs"), max_runs=3
    )
    keys = [hashlib.sha1(f"u{i}".encode()).digest() for i in range(100)]
    for k in keys:
        st.add_new(k)
    assert st.spill_count >= 9  # forced spills
    assert st.num_runs <= 3  # merges compacted the run set
    assert st.hot_size < 10  # RAM bound held
    assert len(st) == 100
    assert all(st.contains_batch(keys))
    fresh = [hashlib.sha1(f"v{i}".encode()).digest() for i in range(50)]
    assert not any(st.contains_batch(fresh))
    # snapshot payload = full digest set; load() round-trips it
    snap = st.all_digests()
    assert snap == set(keys)
    st2 = SpillableDigestStore(spill_threshold=10, spill_dir=str(tmp_path / "r2"))
    st2.load(snap)
    assert len(st2) == 100 and all(st2.contains_batch(keys))


def test_seen_shard_spill_admission(ray_session, tmp_path):
    """SADD semantics survive disk spills — including the mid-batch-spill
    hazard where a hot key moves into a run after the run probe ran — and
    snapshot/restore round-trips through the spillable store."""
    import ray

    from simple_crawler_ray.state.seen import SeenShard, url_key

    shard = SeenShard.remote(num_bits=1 << 14, spill_threshold=5)
    first = [f"https://a.example/p{i}" for i in range(4)]
    assert ray.get(shard.admit.remote(first)) == [True] * 4
    # batch: 3 new keys (spill fires at 5 hot: mid-batch), then a repeat
    # of an old hot key, then an intra-batch dup of a new key
    batch = [
        "https://a.example/q0",
        "https://a.example/q1",
        "https://a.example/q2",
        first[0],
        "https://a.example/q0",
    ]
    assert ray.get(shard.admit.remote(batch)) == [True, True, True, False, False]
    stats = ray.get(shard.spill_stats.remote())
    assert stats["spills"] >= 1 and stats["total"] == 7
    assert ray.get(shard.contains.remote(first + ["https://a.example/qX"])) == [
        True,
        True,
        True,
        True,
        False,
    ]
    # snapshot → restore into a fresh shard: membership identical
    snap = ray.get(shard.snapshot.remote())
    shard2 = SeenShard.remote(num_bits=1 << 14, spill_threshold=5)
    assert ray.get(shard2.restore.remote(snap)) == 7
    assert ray.get(shard2.admit.remote(batch)) == [False] * 5
    ray.kill(shard)
    ray.kill(shard2)
