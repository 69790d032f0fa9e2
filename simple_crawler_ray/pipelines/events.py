"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time watermarks; stream semantics are expressed as
partition-by-key + sort-within-group (ray_guide §streaming): sessionization
runs in ``groupby(user_id).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

__all__ = ["e1_sessionize", "e2_topk_users"]

_GAP_MIN = 30


def e2_topk_users(sf_dir: str):
    """Top-10 users by total event value: grouped aggregate → global sort
    → limit (agg+top-k composition; ties broken by user_id)."""
    from ray.data.aggregate import Count, Sum

    agg = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total"), Count(alias_name="n"))
        .sort(["total", "user_id"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "user_id": agg["user_id"].astype("int64"),
            "total_value": agg["total"].round(4),
            "n_events": agg["n"].astype("int64"),
        }
    )


def e1_sessionize(sf_dir: str):
    """Session windows with a 30-minute inactivity gap, per user:
    n_sessions + n_events (int outputs; oracle = SQL lag/window)."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        gaps = g["ts"].diff() > pd.Timedelta(minutes=_GAP_MIN)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(gaps.sum()) + 1],
                "n_events": [len(g)],
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )
