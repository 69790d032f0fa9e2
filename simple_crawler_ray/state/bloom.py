"""Mergeable, serializable Bloom filter (numpy bit array).

Used as the fast-path membership pre-filter inside each URL-seen shard
(north_star: "sharded Bloom/cuckoo-filter URL-seen set"). The exact
raw-URL set remains authoritative so SADD parity holds — a Bloom
false-positive must never drop a URL (SURVEY §2.6 O3, §7.4): positives are
confirmed against the exact store; negatives skip the exact lookup
entirely, which is the scale win (at 10^10 URLs the exact store is a
disk-backed shard, the Bloom stays in RAM).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["BloomFilter"]


class BloomFilter:
    """k-hash Bloom filter over byte keys.

    ``num_bits`` should be ≈ 10× expected elements for ~1% FP at k=7.
    """

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 7):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self._words = np.zeros(num_bits // 64, dtype=np.uint64)

    def _positions(self, key: bytes) -> np.ndarray:
        # double hashing: h_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        d = hashlib.sha1(key).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.num_bits)

    def add(self, key: bytes) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(
            self._words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def __contains__(self, key: bytes) -> bool:
        pos = self._positions(key)
        words = self._words[(pos >> np.uint64(6)).astype(np.int64)]
        masks = np.uint64(1) << (pos & np.uint64(63))
        return bool(np.all(words & masks))

    def merge(self, other: "BloomFilter") -> None:
        assert self.num_bits == other.num_bits and self.num_hashes == other.num_hashes
        self._words |= other._words

    # -- checkpoint (de)serialization -------------------------------------
    def to_bytes(self) -> bytes:
        header = self.num_bits.to_bytes(8, "big") + self.num_hashes.to_bytes(4, "big")
        return header + self._words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        num_bits = int.from_bytes(data[:8], "big")
        num_hashes = int.from_bytes(data[8:12], "big")
        bf = cls(num_bits=num_bits, num_hashes=num_hashes)
        bf._words = np.frombuffer(data[12:], dtype=np.uint64).copy()
        return bf
