"""Multimodal plumbing: opaque binary payload columns processed by an
actor-pool ``map_batches`` stage.

Images/audio/video are treated as ``binary`` columns with typed metadata.
The decode step is STUBBED (no imaging/audio libraries in this
environment): ``decode_payload`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected — the Ray-side plumbing (schema,
batch size, actor-pool signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data as rd

__all__ = ["decode_payload", "BinaryFeatureStage", "m1_binary_features"]


def decode_payload(payload: bytes, kind: str = "image", fake: bool = False):
    """Decode a binary media payload.

    Real decoding requires imaging/audio libraries not present in this
    container; the ``fake`` decoder is deterministic and exercises the full
    Ray plumbing. cf. the driver brief: stub decode behind a clearly-marked
    NotImplementedError and keep the Ray-side layout real.
    """
    if not fake:
        raise NotImplementedError(
            f"{kind} decoding needs external media libraries (not in this env); "
            "run with fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload).digest()
    return {"n_bytes": len(payload), "feature": digest[:8].hex()}


class BinaryFeatureStage:
    """Actor-pool stage: per-payload feature extraction over a binary
    column. State (the 'model'/decoder setup) is built ONCE per actor in
    __init__; __call__ handles one batch (ray_guide §actor pools)."""

    def __init__(self, fake: bool = True):
        self.fake = fake  # stand-in for loading a decode model

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = [t.encode("utf-8") for t in batch["text"]]
        feats = [decode_payload(p, fake=self.fake) for p in payloads]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                "content_md5": [
                    hashlib.md5(p).hexdigest() for p in payloads
                ],
            }
        )


def m1_binary_features(sf_dir: str):
    """Binary-payload feature extraction via an actor pool: byte length +
    content digest per payload (documents.text bytes stand in for the
    opaque media column). SQL oracle: octet_length + md5."""
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        BinaryFeatureStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pandas",
        batch_size=1024,
        concurrency=2,
    )
