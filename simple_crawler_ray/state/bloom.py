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

    def _positions_many(self, keys: list[bytes]) -> np.ndarray:
        """(n, k) bit positions; double hashing h_i = h1 + i*h2
        (Kirsch–Mitzenmacher)."""
        h1 = np.empty(len(keys), dtype=np.uint64)
        h2 = np.empty(len(keys), dtype=np.uint64)
        for j, key in enumerate(keys):
            d = hashlib.sha1(key).digest()
            h1[j] = int.from_bytes(d[:8], "big")
            h2[j] = int.from_bytes(d[8:16], "big") | 1
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def _positions_from_digests(self, digests: np.ndarray) -> np.ndarray:
        """(n, k) bit positions from PRE-HASHED keys: ``digests`` is an
        (n, 20) uint8 matrix of SHA-1 digests (h1/h2 taken from bytes 0-8
        and 8-16 — same double-hashing scheme as ``_positions_many`` but
        with zero per-key Python work, for callers that already carry the
        digest as data)."""
        h1 = digests[:, :8].copy().view(">u8").ravel().astype(np.uint64)
        h2 = digests[:, 8:16].copy().view(">u8").ravel().astype(np.uint64) | np.uint64(
            1
        )
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def add_digests(self, digests: np.ndarray) -> None:
        """Vectorized insert of (n, 20) uint8 SHA-1 digests."""
        if not len(digests):
            return
        pos = self._positions_from_digests(digests).ravel()
        np.bitwise_or.at(
            self._words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_digests(self, digests: np.ndarray) -> np.ndarray:
        """Boolean maybe-present per (n, 20) uint8 SHA-1 digest row."""
        if not len(digests):
            return np.zeros(0, dtype=bool)
        pos = self._positions_from_digests(digests)
        words = self._words[(pos >> np.uint64(6)).astype(np.int64)]
        masks = np.uint64(1) << (pos & np.uint64(63))
        return ((words & masks) != 0).all(axis=1)

    def add_many(self, keys: list[bytes]) -> None:
        if not keys:
            return
        pos = self._positions_many(keys).ravel()
        np.bitwise_or.at(
            self._words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, keys: list[bytes]) -> np.ndarray:
        """Boolean array: maybe-present per key (vectorized)."""
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = self._positions_many(keys)
        words = self._words[(pos >> np.uint64(6)).astype(np.int64)]
        masks = np.uint64(1) << (pos & np.uint64(63))
        return ((words & masks) != 0).all(axis=1)

    def add(self, key: bytes) -> None:
        self.add_many([key])

    def __contains__(self, key: bytes) -> bool:
        return bool(self.contains_many([key])[0])

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
