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
