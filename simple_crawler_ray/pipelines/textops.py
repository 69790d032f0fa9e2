"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language-ID, quality scoring, token
counting, fingerprinting). Every op is vectorized inside ``map_batches``
and has an exact DuckDB oracle (integer outputs / identical regexes on
both sides keep the value-hash comparison exact).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = [
    "t1_token_stats",
    "t2_quality_score",
    "t3_langid",
    "t4_fingerprint",
    "t5_chunk_documents",
]

_WS_SPLIT = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")

# stopword markers per language (tiny n-gram/stopword heuristic; the texts
# are synthetic so the mechanism — not linguistic accuracy — is under test)
_LANG_MARKERS = {
    "en": r"\b(the|a|and|of)\b",
    "de": r"\b(der|und|die|das)\b",
    "fr": r"\b(le|la|et|les)\b",
}


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def t1_token_stats(sf_dir: str):
    """Whitespace token counting + per-language stats (partial-agg →
    final groupby; int outputs for exact oracle parity)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ntok = (
            batch["text"]
            .str.strip()
            .map(lambda s: len(_WS_SPLIT.split(s)) if s else 0)
        )
        batch = batch.assign(n_tokens=ntok)
        return batch.groupby("lang", as_index=False).agg(
            p_docs=("n_tokens", "size"), p_tokens=("n_tokens", "sum")
        )

    agg = (
        _docs(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("lang")
        .aggregate(Sum("p_docs", alias_name="docs"), Sum("p_tokens", alias_name="toks"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "lang": agg["lang"],
            "n_docs": agg["docs"].astype("int64"),
            "total_tokens": agg["toks"].astype("int64"),
        }
    )


def t2_quality_score(sf_dir: str):
    """Per-document quality metrics (length / punctuation / token counts,
    all integers) + an integer quality flag — the doc-quality scoring
    stage of a training-data pipeline."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_chars = text.str.len().astype("int64")
        n_tokens = (
            text.str.strip().map(lambda s: len(_WS_SPLIT.split(s)) if s else 0)
        ).astype("int64")
        n_punct = text.str.count(_PUNCT).astype("int64")
        is_quality = ((n_tokens >= 20) & (n_chars >= 100)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "is_quality": is_quality,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas", batch_size=4096
    )


def t3_langid(sf_dir: str):
    """Stopword-marker language ID: count per-language marker hits, argmax
    with deterministic tie-break en > de > fr > unknown."""

    def predict(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        scores = {
            lang: low.str.count(pat).astype("int64")
            for lang, pat in _LANG_MARKERS.items()
        }
        best = pd.Series(["unknown"] * len(batch), index=batch.index)
        best_score = pd.Series([0] * len(batch), index=batch.index, dtype="int64")
        for lang in ("en", "de", "fr"):  # deterministic priority order
            s = scores[lang]
            win = s > best_score
            best = best.mask(win, lang)
            best_score = best_score.mask(win, s)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype("int64"), "lang_pred": best}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        predict, batch_format="pandas", batch_size=4096
    )


def t5_chunk_documents(sf_dir: str, chunk_chars: int = 200):
    """Fixed-size document chunking (the LLM-training-data sharding op):
    explode each doc into (doc_id, chunk_idx, chunk_text) rows inside
    map_batches — a flat-map over zero-copy batches."""

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, chunks = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            for i in range(0, max(1, len(text)), chunk_chars):
                ids.append(int(doc_id))
                idxs.append(i // chunk_chars)
                chunks.append(text[i : i + chunk_chars])
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "chunk_text": chunks,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pandas", batch_size=4096
    )


def t4_fingerprint(sf_dir: str):
    """Document fingerprinting: md5 content digest (hex) per doc — the
    exact-dedup key of a training-data pipeline (north-star text ops)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "fingerprint": batch["text"].map(
                    lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pandas", batch_size=4096
    )
