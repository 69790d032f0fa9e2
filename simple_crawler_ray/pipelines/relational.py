"""Relational operator catalog over the TPC-H-ish test tables.

These queries exercise the engine's generic dataflow operators — filter /
project / computed columns, partial-then-final aggregation, broadcast and
hash-partitioned joins, sort/limit top-k, distinct, union — each with an
exact DuckDB oracle (see __ray_entry__.oracle_sql). The reference crawler
has no relational surface (SURVEY §2.4: lookups only), so these are the
rebuild's general data-processing capabilities expressed Ray-Data-first.

Scale notes applied throughout:
- reads prune columns (``columns=[...]``);
- aggregations pre-aggregate per batch inside ``map_batches`` (one partial
  row per key per batch) before the small final ``groupby`` shuffle;
- small dimension tables are broadcast via ``ray.put`` and joined inside
  ``map_batches`` (no shuffle); only genuinely large-large joins use the
  hash-partitioned ``Dataset.join``;
- float aggregates are rounded identically on both the Ray and SQL side
  (summation order differs between engines; rounding defines the contract).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .io import read_clean, retry_join_flake
from ray.data.aggregate import Count, Sum

__all__ = [
    "q16_order_date_lag",
    "q18_pivot_hourly",
    "q19_left_join_order_counts",
    "q20_running_revenue",
    "q17_rollup_revenue",
    "q1_pricing_summary",
    "q2_topk_orders",
    "q3_segment_revenue",
    "q4_priority_revenue",
    "q5_region_acctbal",
    "q6_forecast_revenue",
    "q7_distinct_event_types",
    "q8_hourly_events",
    "q9_union_counts",
    "q10_above_avg_customers",
    "q11_value_extremes",
    "q12_price_quantiles",
    "q12b_approx_quantiles",
    "q13_customers_without_orders",
    "q14_grouped_quantiles",
    "q14b_grouped_approx_quantiles",
    "q15_above_customer_avg",
]


def _li(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return read_clean(f"{sf_dir}/lineitem.parquet", columns)


def partitioned_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    final,
    num_parts: int = 64,
) -> rd.Dataset:
    """Distributed final aggregation for HIGH-CARDINALITY group keys.

    Ray's builtin ``groupby().aggregate(...)`` pays per-group Python
    overhead (measured ~5 ms/group — 18 s for 3.4k groups on one block),
    so instead: hash the key columns to a coarse ``part`` id (CONSTANT
    Ray group count = ``num_parts``; every row of a key lands in one
    part) and run the caller's vectorized pandas aggregation within each
    partition via ``groupby("part").map_groups``. This is the same
    hash-partitioned shuffle an exchange operator would do — partial rows
    never concentrate on the driver — with the per-group work vectorized.

    ``final(df)`` receives one partition's rows (minus ``part``) and must
    return the aggregated frame for the keys it holds.
    """

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[keys], index=False)
        return batch.assign(part=(h % num_parts).astype("int64"))

    def per_part(grp: pd.DataFrame) -> pd.DataFrame:
        return final(grp.drop(columns=["part"]))

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def hot_keys(ds: rd.Dataset, key_col: str, threshold: int) -> dict[int, int]:
    """Bounded hot-key census for the skew-aware co-partition operators
    (e5/e6/q15 — round-3 VERDICT #3): per-batch partial counts → coarse
    hash-partitioned combine → only keys with > ``threshold`` rows reach
    the driver. The result is bounded by total_rows/threshold entries BY
    CONSTRUCTION (a key needs > threshold rows to appear), so the collect
    can never be O(distinct keys). Input column must be integer-typed."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key_col, as_index=False).size()
        return g.rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False)["p_n"].sum()
        return g[g["p_n"] > threshold]

    out = partitioned_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        [key_col],
        final,
    ).to_pandas()
    if out.empty:  # all-empty partition outputs can drop the schema
        return {}
    return dict(
        zip(out[key_col].astype("int64"), out["p_n"].astype("int64"))
    )


# session memo of census results, keyed by (realpath, mtime, key_col,
# threshold): one census per table per session instead of one per
# skew-aware operator (round-4 VERDICT 'What's wrong' #3 — a bench sweep
# ran four separate reads+censuses of the same events table)
_CENSUS_MEMO: dict[tuple, dict[int, int]] = {}


def hot_keys_for(path: str, key_col: str, threshold: int) -> dict[int, int]:
    """Memoized ``hot_keys`` over the CANONICAL single-column projection
    of a parquet table: every skew-aware operator keyed on the same
    (table, key, threshold) shares one census pass per session, and the
    census read ships exactly one column. The count is over RAW table
    rows per key — operators that pre-filter/pre-aggregate their stream
    (e5/e6/e8) treat it as an upper-bound skew signal, which only makes
    the hot route engage earlier; both routes are oracle-exact either
    way (skew stress tests)."""
    import os

    rp = os.path.realpath(path)
    try:
        mtime = os.path.getmtime(rp)
    except OSError:
        mtime = -1.0
    memo_key = (rp, mtime, key_col, threshold)
    if memo_key not in _CENSUS_MEMO:
        from .io import read_clean

        while len(_CENSUS_MEMO) >= 64:
            _CENSUS_MEMO.pop(next(iter(_CENSUS_MEMO)))
        _CENSUS_MEMO[memo_key] = hot_keys(
            read_clean(path, [key_col]), key_col, threshold
        )
    return _CENSUS_MEMO[memo_key]


# ---------------------------------------------------------------------------
def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary: filter → per-batch partial aggregate →
    small final groupby (the partial/combiner pattern; ray_guide §agg).

    Money columns live on a 2-decimal grid, so the sums are carried as
    EXACT int64 (price cents; discounted price in cents×100 = 1e-4
    dollars): integer prefix sums are order-independent, which makes the
    oracle compare bit-exact at ANY scale — a round(k) float contract is
    one summation-order ulp away from a .xx5 boundary collision (observed
    live at sf0.001 during round 5). Quantities are integer-valued, so
    their float sums are exact as-is."""
    import numpy as np

    cutoff = pd.Timestamp("1998-09-02")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_shipdate"] <= cutoff]
        base_c = np.round(
            batch["l_extendedprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        disc_c = np.round(
            batch["l_discount"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        batch = batch.assign(
            base_c=base_c,
            disc_price_e4=base_c * (100 - disc_c),
            disc_c=disc_c,
        )
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("l_quantity", "sum"),
            p_base=("base_c", "sum"),
            p_disc_price=("disc_price_e4", "sum"),
            p_disc=("disc_c", "sum"),
            p_n=("l_quantity", "size"),
        )
        return g

    ds = _li(
        sf_dir,
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )
    agg = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="s_qty"),
            Sum("p_base", alias_name="s_base"),
            Sum("p_disc_price", alias_name="s_disc_price"),
            Sum("p_disc", alias_name="s_disc"),
            Sum("p_n", alias_name="s_n"),
        )
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["s_qty"].round(2),
            "sum_base_price": agg["s_base"].astype("int64") / 100.0,
            "sum_disc_price": agg["s_disc_price"].astype("int64") / 10000.0,
            "avg_disc": (
                (agg["s_disc"].astype("int64") / 100.0) / agg["s_n"]
            ).round(6),
            "count_order": agg["s_n"].astype("int64"),
        }
    )


def q2_topk_orders(sf_dir: str):
    """Global top-k WITHOUT a global sort (SURVEY §2.6 — absent in the
    reference): each batch keeps its local top-k (≤ k rows leave the
    batch), the driver merges the ≤ k×n_batches survivors — no all-to-all
    shuffle of the full table, unlike ``sort().limit(k)`` (round-2
    VERDICT 'What's wrong' #4; same shape as s1's partial top-k)."""
    k = 10

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)

    parts = (
        read_clean(
            f"{sf_dir}/orders.parquet",
            ["o_orderkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def q3_segment_revenue(sf_dir: str):
    """Broadcast join: orders ⋈ customer (small side shipped once via
    ``ray.put``, looked up per batch — no shuffle; SURVEY §2.4 J3 pattern)."""
    # dimension tables are read directly on the driver (tiny by definition —
    # that's what makes them broadcastable) and shipped once via ray.put
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        seg = ray.get(seg_ref)
        batch["c_mktsegment"] = batch["o_custkey"].map(seg)
        # exact int64 cents (2-decimal grid): order-independent sums
        batch["rev_c"] = np.round(
            batch["o_totalprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        g = batch.groupby("c_mktsegment", as_index=False).agg(
            p_rev=("rev_c", "sum"), p_n=("rev_c", "size")
        )
        return g

    agg = (
        read_clean(f"{sf_dir}/orders.parquet", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pandas", batch_size=65536)
        .groupby("c_mktsegment")
        .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "c_mktsegment": agg["c_mktsegment"],
            "total_revenue": agg["rev"].astype("int64") / 100.0,
            "n_orders": agg["n"].astype("int64"),
        }
    )


def q4_priority_revenue(sf_dir: str, broadcast_max_build_rows: int = 2_000_000):
    """lineitem ⋈ orders on the order key, size-switched between two join
    regimes (round-4 VERDICT 'Next round' #6 — join-aggregator actor
    spin-up, ~2 s per partition, dominated the bench wall at sf0.1):

    - BROADCAST regime (build side ≤ ``broadcast_max_build_rows``, known
      from parquet metadata without reading data): the (sorted o_orderkey,
      priority-code) arrays are ``ray.put`` once; every lineitem batch
      probes them with vectorized ``searchsorted`` + ``bincount`` partials
      (≤ n_priorities rows per batch), merged on the driver — zero
      shuffles, zero join actors.
    - NATIVE hash-join regime above the bound: both sides shuffled once by
      the hash-partitioned ``Dataset.join``, partitions sized to the DATA
      (~1 per 500k probe rows, min 4 — grows toward the core count at
      cluster scale), retry-wrapped for the intermittent JoinOperator
      FieldRef flake. Regime parity is pinned in tests."""
    import numpy as np

    n_build = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_build <= broadcast_max_build_rows:
        orders = read_clean(
            f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderpriority"]
        ).to_pandas()  # bounded by the regime switch
        keys = orders["o_orderkey"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        cat = orders["o_orderpriority"].astype("category")
        cats = list(cat.cat.categories)
        build_ref = ray.put((keys[order], cat.cat.codes.to_numpy(np.int64)[order]))

        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            bkeys, bcodes = ray.get(build_ref)
            lk = batch["l_orderkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(bkeys, lk), 0, len(bkeys) - 1)
            ok = bkeys[idx] == lk  # inner-join semantics
            # exact 1e-4-dollar ints (the 2-decimal × 2-decimal grid);
            # per-batch bincount totals stay < 2^53 so the float weights
            # are exact, then re-integerized for the driver-side sum
            base_c = np.round(
                batch["l_extendedprice"].to_numpy(np.float64) * 100.0
            ).astype(np.int64)
            disc_c = np.round(
                batch["l_discount"].to_numpy(np.float64) * 100.0
            ).astype(np.int64)
            rev = (base_c * (100 - disc_c)).astype(np.float64)[ok]
            code = bcodes[idx[ok]]
            return pd.DataFrame(
                {
                    "code": np.arange(len(cats), dtype=np.int64),
                    "p_rev": np.bincount(
                        code, weights=rev, minlength=len(cats)
                    ).astype("int64"),
                    "p_n": np.bincount(code, minlength=len(cats)).astype("int64"),
                }
            )

        partials = (
            _li(sf_dir, ["l_orderkey", "l_extendedprice", "l_discount"])
            .map_batches(probe, batch_format="pandas", batch_size=65536)
            .to_pandas()  # ≤ n_priorities rows per batch — driver-bounded
        )
        agg = partials.groupby("code", as_index=False).agg(
            rev=("p_rev", "sum"), n=("p_n", "sum")
        )
        agg = agg[agg["n"] > 0]
        return pd.DataFrame(
            {
                "o_orderpriority": [cats[c] for c in agg["code"]],
                "revenue": agg["rev"].astype("int64") / 10000.0,
                "n_items": agg["n"].astype("int64"),
            }
        ).reset_index(drop=True)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        base_c = np.round(
            batch["l_extendedprice"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        disc_c = np.round(
            batch["l_discount"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        batch = batch.assign(rev=base_c * (100 - disc_c))
        return batch.groupby("o_orderpriority", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("rev", "size")
        )

    def run() -> pd.DataFrame:
        li = _li(sf_dir, ["l_orderkey", "l_extendedprice", "l_discount"])
        orders = read_clean(
            f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderpriority"]
        )
        n_parts = max(4, min(64, li.count() // 500_000))
        joined = li.join(
            orders,
            join_type="inner",
            num_partitions=n_parts,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        return (
            joined.map_batches(partial, batch_format="pandas", batch_size=65536)
            .groupby("o_orderpriority")
            .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_n", alias_name="n"))
            .to_pandas()
        )

    agg = retry_join_flake(run)
    return pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"],
            "revenue": agg["rev"].astype("int64") / 10000.0,
            "n_items": agg["n"].astype("int64"),
        }
    )


def q5_region_acctbal(sf_dir: str):
    """Star-schema multijoin via two broadcast dimension lookups
    (customer ⋈ nation ⋈ region without any shuffle)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({nk: r2name[rk] for nk, rk in n2r.items()})

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        lut = ray.get(lookup_ref)
        batch["r_name"] = batch["c_nationkey"].map(lut)
        # exact int64 cents (2-decimal grid): order-independent sums
        batch["bal_c"] = np.round(
            batch["c_acctbal"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        return batch.groupby("r_name", as_index=False).agg(
            p_bal=("bal_c", "sum"), p_n=("bal_c", "size")
        )

    agg = (
        read_clean(f"{sf_dir}/customer.parquet", ["c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pandas")
        .groupby("r_name")
        .aggregate(Sum("p_bal", alias_name="bal"), Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "r_name": agg["r_name"],
            "total_acctbal": agg["bal"].astype("int64") / 100.0,
            "n_customers": agg["n"].astype("int64"),
        }
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-style scan-heavy filter + global sum (vectorized Arrow
    predicate inside map_batches; single-row result)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(batch["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(0.03)),
                    pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = batch.filter(m)
        # exact 1e-4-dollar int64 partials (2-decimal × 2-decimal grid):
        # order-independent, so the oracle compare is bit-exact at any sf
        base_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev = pc.sum(pc.multiply(base_c, disc_c)).as_py() or 0
        return pa.table({"p_rev": pa.array([rev], pa.int64())})

    ds = _li(sf_dir, ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    total = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).sum(
        "p_rev"
    )
    return pd.DataFrame({"revenue": [int(total) / 10000.0]})


def q7_distinct_event_types(sf_dir: str):
    """Distinct over a column (`unique` — a shuffle; SURVEY §2.6)."""
    vals = read_clean(f"{sf_dir}/events.parquet", ["event_type"]).unique(
        "event_type"
    )
    return pd.DataFrame({"event_type": sorted(vals)})


def q8_hourly_events(sf_dir: str):
    """Tumbling-window aggregate: per (event_type, hour) count + sum(value)
    (streaming-shaped workload on the ordered events log; hour as epoch
    seconds to keep the oracle comparison integer-exact)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            hour_epoch=(
                batch["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
            )
        )
        import numpy as np

        # exact int64 cents (the value column is on a 2-decimal grid):
        # order-independent sums, bit-exact vs the oracle at any scale
        batch["val_c"] = np.round(
            batch["value"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        return batch.groupby(["event_type", "hour_epoch"], as_index=False).agg(
            p_n=("val_c", "size"), p_val=("val_c", "sum")
        )

    # partial per batch, then the final merge as a hash-partitioned Ray
    # shuffle (partitioned_group_agg). Partial count is n_batches x
    # groups-per-batch; at 100 TB (~millions of batches) those partial
    # rows must never concentrate on the driver. The hour key is high
    # cardinality, so the final runs via the coarse-partition pattern
    # rather than the per-group-Python builtin aggregate.
    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "hour_epoch"], as_index=False).agg(
            s_n=("p_n", "sum"), s_val=("p_val", "sum")
        )

    agg = partitioned_group_agg(
        read_clean(f"{sf_dir}/events.parquet", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas", batch_size=65536),
        ["event_type", "hour_epoch"],
        final,
    ).to_pandas()
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "hour_epoch": agg["hour_epoch"].astype("int64"),
            "n_events": agg["s_n"].astype("int64"),
            "sum_value": agg["s_val"].astype("int64") / 100.0,
        }
    )


def q10_above_avg_customers(sf_dir: str):
    """Scalar-subquery pattern: global aggregate computed first (one tiny
    result), broadcast into a vectorized filter, then grouped count —
    the two-phase shape that replaces correlated subqueries at scale."""
    ds = read_clean(f"{sf_dir}/customer.parquet", ["c_nationkey", "c_acctbal"])
    # the threshold itself must be bit-identical in both engines or a
    # customer sitting exactly at the boundary flips the row set: exact
    # int64-cents sum → one division sequence mirrored in the oracle SQL
    stats = ds.map_batches(
        lambda t: pa.table(
            {
                "bal_c": [
                    pc.sum(
                        pc.cast(
                            pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                            pa.int64(),
                        )
                    ).as_py()
                    or 0
                ],
                "n": [t.num_rows],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    avg_bal = (int(stats["bal_c"].sum()) / 100.0) / int(stats["n"].sum())

    def over_avg(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["c_acctbal"], pa.scalar(avg_bal)))

    agg = (
        ds.map_batches(over_avg, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "c_nationkey": agg["c_nationkey"].astype("int64"),
            "n_above_avg": agg["n"].astype("int64"),
        }
    )


def q11_value_extremes(sf_dir: str):
    """Min/Max/Sum/Count grouped aggregates over the events stream.
    Min/max are order-independent by nature; the sum rides as exact
    int64 cents (2-decimal grid) so it is too."""
    from ray.data.aggregate import Max, Min

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "val_c",
            pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        )

    agg = (
        read_clean(f"{sf_dir}/events.parquet", ["event_type", "value"])
        .map_batches(add_cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Min("value", alias_name="vmin"),
            Max("value", alias_name="vmax"),
            Sum("val_c", alias_name="vsum"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "min_value": agg["vmin"].round(6),
            "max_value": agg["vmax"].round(6),
            "sum_value": agg["vsum"].astype("int64") / 100.0,
            "n": agg["n"].astype("int64"),
        }
    )


def q9_union_counts(sf_dir: str):
    """Union of two filtered streams → grouped count (`Dataset.union`)."""
    ev = read_clean(f"{sf_dir}/events.parquet", ["event_type", "value"])
    a = ev.map_batches(
        lambda t: t.filter(pc.greater(t["value"], pa.scalar(50.0))),
        batch_format="pyarrow",
    )
    b = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("error"))),
        batch_format="pyarrow",
    )
    agg = a.union(b).groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    return pd.DataFrame(
        {"event_type": agg["event_type"], "n": agg["n"].astype("int64")}
    )


def q12_price_quantiles(sf_dir: str):
    """EXACT distributed quantiles (p50/p90/p99 of o_totalprice) without a
    global sort: per-batch partial value-counts collapse the stream to
    (distinct value, count) rows, a coarse hash-partitioned final sums
    them, and the quantile is read off the cumulative counts of the SMALL
    distinct-value table (prices live on a bounded 2-decimal grid, so
    distinct values ≪ rows — ~10^7 at 100 TB vs ~10^11 rows; a global
    ``sort()`` of the raw column would shuffle every row for three
    scalars). Selection rule matches DuckDB ``quantile_disc``: the element
    at rank ceil(q*n) of the ascending order (verified empirically).
    Returned values are the ORIGINAL doubles (no lossy re-encode)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("o_totalprice", as_index=False).size()
        return pd.DataFrame(
            {"o_totalprice": g["o_totalprice"], "p_n": g["size"].astype("int64")}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_totalprice", as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "n"})

    counts = partitioned_group_agg(
        read_clean(f"{sf_dir}/orders.parquet", ["o_totalprice"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        keys=["o_totalprice"],
        final=final,
    ).to_pandas()
    counts = counts.sort_values("o_totalprice").reset_index(drop=True)
    cum = counts["n"].cumsum().to_numpy()
    total = int(cum[-1])
    vals = counts["o_totalprice"].to_numpy()
    import numpy as np

    def q_disc(q: float) -> float:
        rank = max(1, int(np.ceil(q * total)))
        return float(vals[int(np.searchsorted(cum, rank, side="left"))])

    return pd.DataFrame(
        {
            "p50": [q_disc(0.5)],
            "p90": [q_disc(0.9)],
            "p99": [q_disc(0.99)],
            "n_orders": [total],
        }
    )


def q13_customers_without_orders(sf_dir: str):
    """Distributed ANTI-JOIN (customers with no URGENT order — the
    predicate keeps the result non-trivial on the synthetic tables, where
    every customer has *some* order) with no broadcast and no driver key
    set: urgent-order custkeys are partially uniqued per batch (the raw
    stream is ~orders/customer x the distinct set), then both sides ride
    one tagged dataset through the coarse hash-partition shuffle — each
    partition drops its side-0 (customer) rows whose key appears in its
    side-1 (order key) rows via one vectorized ``isin``. Every row of a
    key lands in the same partition, so the local anti test is globally
    correct; state per partition is O(partition keys), never O(table) on
    any single node."""

    def cust_side(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": batch["c_custkey"].astype("int64"),
                "side": 0,
                "c_name": batch["c_name"],
                "c_acctbal": batch["c_acctbal"].astype("float64"),
            }
        )

    def order_side(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch.loc[
            batch["o_orderpriority"] == "1-URGENT", "o_custkey"
        ].drop_duplicates()
        # placeholder payloads (dropped by the anti filter) keep the two
        # sides schema-identical for the union without nullable dtypes
        return pd.DataFrame(
            {
                "key": k.astype("int64"),
                "side": 1,
                "c_name": "",
                "c_acctbal": 0.0,
            }
        )

    cust = read_clean(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(cust_side, batch_format="pandas", batch_size=65536)
    ords = read_clean(
        f"{sf_dir}/orders.parquet", ["o_custkey", "o_orderpriority"]
    ).map_batches(order_side, batch_format="pandas", batch_size=65536)

    def anti(df: pd.DataFrame) -> pa.Table:
        have = df.loc[df["side"] == 1, "key"].unique()
        keep = df[(df["side"] == 0) & ~df["key"].isin(have)]
        # explicit Arrow out: a possibly-empty pandas object column trips
        # Ray's block size estimator (size-0 np.vectorize warning)
        return pa.table(
            {
                "c_custkey": pa.array(
                    keep["key"].to_numpy(dtype="int64"), pa.int64()
                ),
                "c_name": pa.array(keep["c_name"].astype(str), pa.string()),
                "c_acctbal": pa.array(
                    keep["c_acctbal"].round(2).to_numpy(dtype="float64"),
                    pa.float64(),
                ),
            }
        )

    out = partitioned_group_agg(
        cust.union(ords), keys=["key"], final=anti
    ).to_pandas()
    if out.empty:  # every customer has an order (possible at tiny scale)
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype="object"),
                "c_acctbal": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def q14_grouped_quantiles(sf_dir: str):
    """EXACT quantiles PER GROUP (p50/p90 of o_totalprice by order
    priority) — the grouped form of q12, again with no global sort: the
    stream collapses to (group, distinct value, count) partials per
    batch, the coarse hash-partition (keyed on the GROUP, so every row
    of a group lands together) sums them, and each partition reads its
    groups' quantiles off cumulative counts fully vectorized
    (``groupby.cumsum`` + first-hit-at-rank via ``groupby.first`` —
    no per-group Python loop). Selection rule = DuckDB ``quantile_disc``
    (rank ceil(q*n), verified in q12)."""
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(
            ["o_orderpriority", "o_totalprice"], as_index=False
        ).size()
        return g.rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["o_orderpriority", "o_totalprice"], as_index=False)["p_n"]
            .sum()
            .sort_values(["o_orderpriority", "o_totalprice"], kind="mergesort")
        )
        g["cum"] = g.groupby("o_orderpriority")["p_n"].cumsum()
        tot = g.groupby("o_orderpriority")["p_n"].transform("sum")
        out = g.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("p_n", "sum")
        )
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            target = np.maximum(1, np.ceil(q * tot.to_numpy()))
            hit = g[g["cum"].to_numpy() >= target]
            sel = hit.groupby("o_orderpriority", as_index=False).agg(
                val=("o_totalprice", "first")
            )
            out = out.merge(sel, on="o_orderpriority").rename(
                columns={"val": col}
            )
        return out[["o_orderpriority", "p50", "p90", "n_orders"]].astype(
            {"n_orders": "int64"}
        )

    out = partitioned_group_agg(
        read_clean(
            f"{sf_dir}/orders.parquet", ["o_orderpriority", "o_totalprice"]
        ).map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["o_orderpriority"],
        final=final,
    ).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_Q15_HOT_ROWS = 500_000
_Q15_SALTS = 8


def q15_above_customer_avg(sf_dir: str, hot_threshold: int = _Q15_HOT_ROWS):
    """Correlated-subquery filter (orders priced above their OWN
    customer's average) in ONE hash-partitioned pass — no join, no
    second scan: partitioning by the correlation key puts every
    customer's orders in the same partition, where the per-customer mean
    is a vectorized ``groupby.transform`` and the filter is column math.
    The SQL form is a correlated scalar subquery (or a self-join +
    re-join); the dataflow form is just key-partition + local
    vectorized pass.

    HOT KEYS (round-3 VERDICT #3): a customer with > ``hot_threshold``
    orders would concentrate its whole history in one pandas frame, so
    above the threshold the operator switches to the SALTED two-stage
    form: per-key means are computed skew-immune (per-batch partials are
    bounded by distinct keys per batch, so even a hot key contributes
    ≤ n_batches partial rows to its partition), then the filter pass
    re-partitions orders by (custkey, salt = o_orderkey % 8) with each
    key's mean row replicated once per salt (tagged-union, the q13
    shape) — every frame shrinks 8×, arbitrary additional skew is a
    constant away. Exactness pinned by the skew stress test."""
    import numpy as np

    def final(d: pd.DataFrame) -> pd.DataFrame:
        # price > group mean ⟺ price_cents × n > sum_cents: pure int64
        # arithmetic on the 2-decimal grid — no float mean, so the
        # boundary row set is identical in both engines at any scale
        price_c = np.round(
            d["o_totalprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        d = d.assign(price_c=price_c)
        grp = d.groupby("o_custkey")["price_c"]
        keep = d[
            price_c * grp.transform("size").to_numpy()
            > grp.transform("sum").to_numpy()
        ]
        return pd.DataFrame(
            {
                "o_orderkey": keep["o_orderkey"].astype("int64"),
                "o_custkey": keep["o_custkey"].astype("int64"),
                "o_totalprice": keep["o_totalprice"].astype("float64"),
            }
        )

    hot = hot_keys_for(f"{sf_dir}/orders.parquet", "o_custkey", hot_threshold)
    orders = read_clean(
        f"{sf_dir}/orders.parquet",
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )

    if not hot:
        # O(input)-sized output: return the LAZY Dataset (d1 precedent) —
        # the consumer collects or streams; no driver-side collect+sort,
        # no materialize anywhere on the common path
        return partitioned_group_agg(orders, keys=["o_custkey"], final=final)

    # --- salted route (orders read twice → materialize once) -----------
    orders = orders.materialize()
    def mean_partial(b: pd.DataFrame) -> pd.DataFrame:
        # exact int64 cents (see the cold route's integer comparison)
        b = b.assign(
            price_c=np.round(
                b["o_totalprice"].to_numpy(dtype="float64") * 100.0
            ).astype("int64")
        )
        g = b.groupby("o_custkey", as_index=False).agg(
            p_sum=("price_c", "sum"), p_n=("price_c", "size")
        )
        return g

    def mean_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            s=("p_sum", "sum"), n=("p_n", "sum")
        )
        rows = []
        for salt in range(_Q15_SALTS):
            rows.append(
                pd.DataFrame(
                    {
                        "o_custkey": g["o_custkey"].astype("int64"),
                        "salt": np.int64(salt),
                        "side": np.int8(1),
                        "o_orderkey": np.int64(-1),
                        "o_totalprice": np.float64(0.0),
                        "sum_c": g["s"].astype("int64"),
                        "grp_n": g["n"].astype("int64"),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    means = partitioned_group_agg(
        orders.map_batches(mean_partial, batch_format="pandas", batch_size=65536),
        keys=["o_custkey"],
        final=mean_final,
    )

    def salt_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].astype("int64"),
                "salt": (b["o_orderkey"] % _Q15_SALTS).astype("int64"),
                "side": np.int8(0),
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_totalprice": b["o_totalprice"].astype("float64"),
                "sum_c": np.int64(0),
                "grp_n": np.int64(0),
            }
        )

    def salted_final(d: pd.DataFrame) -> pd.DataFrame:
        # several salts of one custkey can hash into the same partition —
        # their stat rows are identical, dedup before the index lookup
        stats = d[d["side"] == 1].drop_duplicates("o_custkey").set_index(
            "o_custkey"
        )
        rows = d[d["side"] == 0]
        price_c = np.round(
            rows["o_totalprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        sum_c = rows["o_custkey"].map(stats["sum_c"]).to_numpy(dtype="int64")
        grp_n = rows["o_custkey"].map(stats["grp_n"]).to_numpy(dtype="int64")
        keep = rows[price_c * grp_n > sum_c]
        return pd.DataFrame(
            {
                "o_orderkey": keep["o_orderkey"].astype("int64"),
                "o_custkey": keep["o_custkey"].astype("int64"),
                "o_totalprice": keep["o_totalprice"].astype("float64"),
            }
        )

    return partitioned_group_agg(
        orders.map_batches(salt_orders, batch_format="pandas").union(means),
        keys=["o_custkey", "salt"],
        final=salted_final,
    )


_Q16_SUBPARTS = 64


def q16_order_date_lag(sf_dir: str, hot_threshold: int = _Q15_HOT_ROWS):
    """WINDOW FUNCTION (lag) over a partitioned stream: for every order,
    the number of days since the SAME customer's previous order — the
    ``LAG() OVER (PARTITION BY key ORDER BY ...)`` operator class, which
    Ray Data has no native form of. Dataflow form: co-partition by the
    window key (the same constant-partition hash shuffle as every
    aggregate here), then ONE vectorized pass per partition — mergesort
    by (custkey, date, orderkey), ``shift()``, and a same-customer mask.
    First orders get sentinel -1 (the null-vs-NaN hash gotcha, like e5).
    Deterministic under date ties via the orderkey tie-break in BOTH
    engines.

    HOT KEYS: lag's only cross-row dependency is the IMMEDIATELY
    PREVIOUS row, so a hot key sub-splits by day-range bucket with a
    ONE-ROW carry — each (key, bucket)'s carry is the last row of the
    key's previous OCCUPIED bucket (a tiny per-(key, bucket) last-row
    table + one shift, ≤ n_hot × subparts rows), injected as a marked
    row that seeds the shift and is dropped from output. Exact under
    one-key-50% skew (stress test)."""
    import numpy as np

    def lag_frame(d: pd.DataFrame) -> pd.DataFrame:
        # carry rows are exact copies of a real row from the previous
        # occupied bucket; when both collide into one partition the carry
        # must sort AFTER its real twin (is_carry as the last sort key),
        # otherwise the real row would shift off its own duplicate and
        # report gap 0 — tie order is otherwise block-order-dependent
        keys = ["o_custkey", "o_orderdate", "o_orderkey"]
        if "is_carry" in d.columns:
            keys = keys + ["is_carry"]
        d = d.sort_values(keys, kind="mergesort")
        days = (
            d["o_orderdate"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        prev_days = days.shift()
        same = d["o_custkey"].eq(d["o_custkey"].shift())
        gap = (days - prev_days).where(same, -1).fillna(-1)
        out = pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "o_custkey": d["o_custkey"].astype("int64"),
                "order_day": days.astype("int64"),
                "gap_days": gap.astype("int64"),
            }
        )
        if "is_carry" in d.columns:
            out = out[~d["is_carry"].to_numpy(dtype=bool)]
        return out

    hot = hot_keys_for(f"{sf_dir}/orders.parquet", "o_custkey", hot_threshold)
    orders = read_clean(
        f"{sf_dir}/orders.parquet",
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )

    if not hot:
        # O(input)-sized output: return the LAZY Dataset (d1 precedent)
        return partitioned_group_agg(orders, keys=["o_custkey"], final=lag_frame)

    orders = orders.materialize()  # hot route reads it twice
    hot_ref = ray.put(set(hot))

    out_cold = partitioned_group_agg(
        orders.map_batches(
            lambda b: b[~b["o_custkey"].isin(ray.get(hot_ref))],
            batch_format="pandas",
        ),
        keys=["o_custkey"],
        final=lag_frame,
    )

    hot_ds = orders.map_batches(
        lambda b: b[b["o_custkey"].isin(ray.get(hot_ref))].assign(
            is_carry=False
        ),
        batch_format="pandas",
    ).materialize()
    from ray.data.aggregate import Max, Min

    bounds = hot_ds.aggregate(Min("o_orderdate"), Max("o_orderdate"))
    d_min = pd.Timestamp(bounds["min(o_orderdate)"]).value // 1000
    d_max = pd.Timestamp(bounds["max(o_orderdate)"]).value // 1000
    span = max(1, (d_max - d_min) // _Q16_SUBPARTS + 1)

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        us = b["o_orderdate"].astype("datetime64[us]").astype("int64")
        return b.assign(bkt=((us - d_min) // span).astype("int64"))

    bucketed = hot_ds.map_batches(add_bkt, batch_format="pandas")

    # per-(key, occupied bucket) LAST row — tiny by construction; the
    # carry for each occupied bucket is the previous occupied bucket's
    # last row (one groupby + one shift on the driver)
    def last_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        return s.groupby(["o_custkey", "bkt"], as_index=False).last()[
            ["o_custkey", "bkt", "o_orderkey", "o_orderdate"]
        ]

    last_rows = (
        bucketed.map_batches(last_partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        .groupby(["o_custkey", "bkt"], as_index=False)
        .last()
        .sort_values(["o_custkey", "bkt"], kind="mergesort")
    )
    same_key = last_rows["o_custkey"].eq(last_rows["o_custkey"].shift())
    carry = pd.DataFrame(
        {
            "o_orderkey": last_rows["o_orderkey"].shift(),
            "o_custkey": last_rows["o_custkey"],
            "o_orderdate": last_rows["o_orderdate"].shift(),
            "is_carry": True,
            "bkt": last_rows["bkt"],
        }
    )[same_key.to_numpy()]
    carry = pd.DataFrame(
        {
            "o_orderkey": carry["o_orderkey"].astype("int64"),
            "o_custkey": carry["o_custkey"].astype("int64"),
            "o_orderdate": carry["o_orderdate"].astype("datetime64[us]"),
            "is_carry": True,
            "bkt": carry["bkt"].astype("int64"),
        }
    )

    hot_in = bucketed.map_batches(
        lambda b: b.assign(
            o_orderdate=b["o_orderdate"].astype("datetime64[us]")
        )[["o_orderkey", "o_custkey", "o_orderdate", "is_carry", "bkt"]],
        batch_format="pandas",
    )
    if len(carry):
        hot_in = hot_in.union(rd.from_pandas(carry))

    def lag_bucketed(d: pd.DataFrame) -> pd.DataFrame:
        # carry rows sort adjacent to (or as ties of) the previous
        # bucket's genuine last row; either way the first real row of
        # each bucket shifts off the correct predecessor
        return lag_frame(d)

    out_hot = partitioned_group_agg(
        hot_in, keys=["o_custkey", "bkt"], final=lag_bucketed
    )

    # both sides are LAZY (never materialized before the union — the
    # materialized-union executor deadlock, see d6's state notes)
    return out_cold.union(out_hot)


def q17_rollup_revenue(sf_dir: str):
    """GROUPING-SETS / ROLLUP aggregate: revenue and order count per
    priority PLUS the grand-total row ('ALL') — computed from ONE scan:
    the per-batch partials feed the per-priority final (a tiny groupby —
    priority is low-cardinality), and the grand total is derived by
    re-aggregating the final's own few rows on the driver, never a
    second pass over the table. The general N-level rollup is the same
    shape: aggregate at the finest level once, then collapse upward
    level by level over the (small) aggregated table."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # exact int64 cents (2-decimal grid): order-independent sums
        batch["rev_c"] = np.round(
            batch["o_totalprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        return batch.groupby("o_orderpriority", as_index=False).agg(
            p_rev=("rev_c", "sum"), p_n=("rev_c", "size")
        )

    agg = (
        read_clean(
            f"{sf_dir}/orders.parquet", ["o_orderpriority", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("o_orderpriority")
        .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    per_level = pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"],
            "revenue": agg["rev"].astype("int64") / 100.0,
            "n_orders": agg["n"].astype("int64"),
        }
    )
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "revenue": [int(agg["rev"].sum()) / 100.0],
            "n_orders": [int(agg["n"].sum())],
        }
    )
    out = pd.concat([per_level, total], ignore_index=True)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_Q18_TYPES = ("click", "error", "purchase", "signup", "view")


def q18_pivot_hourly(sf_dir: str):
    """PIVOT (long → wide reshape): per hour-of-day, one count column per
    event type — the reshape operator of reporting pipelines. Dataflow
    form: conditional aggregation — each batch pre-aggregates a
    (hour, type) contingency partial, the small final groupby sums, and
    the wide columns are filled by one vectorized unstack on the driver
    (the result is `24 × n_types`, driver-sized by construction; the
    wide-column set must be KNOWN/fixed — the relational pivot
    restriction — so unexpected types fail loudly)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour": pc.cast(pc.hour(batch["ts"]), pa.int64()),
                "event_type": batch["event_type"],
            }
        )
        g = t.group_by(["hour", "event_type"]).aggregate([([], "count_all")])
        return g.select(["hour", "event_type", "count_all"]).rename_columns(
            ["hour", "event_type", "p_n"]
        )

    agg = (
        read_clean(f"{sf_dir}/events.parquet", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    unexpected = set(agg["event_type"]) - set(_Q18_TYPES)
    assert not unexpected, f"unknown event types for pivot: {unexpected}"
    wide = (
        agg.pivot(index="hour", columns="event_type", values="n")
        .reindex(columns=list(_Q18_TYPES))  # schema-stable wide columns
        .fillna(0)
        .astype("int64")
        .reset_index()
    )
    wide.columns = ["hour"] + [f"n_{c}" for c in wide.columns[1:]]
    return wide.sort_values("hour").reset_index(drop=True).astype({"hour": "int64"})


def q19_left_join_order_counts(sf_dir: str):
    """LEFT OUTER JOIN + grouped aggregate: every customer with their
    order count and total spend — customers with no orders kept at
    (0, 0.0). Completes the join family (inner q4, broadcast q3/q5,
    anti q13, as-of e5, range e6): the outer side rides the q13
    tagged-union co-partition — customer rows side 0, per-batch partial
    order aggregates side 1 (one row per (custkey, batch), so a
    customer's orders collapse BEFORE the shuffle) — and each partition
    emits its side-0 rows with the summed side-1 partials, zero-filled
    where none exist. No nullable columns cross the engine boundary
    (the e5 sentinel discipline)."""

    def cust_side(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": batch["c_custkey"].astype("int64"),
                "side": 0,
                "p_n": 0,
                "p_total": 0.0,
            }
        )

    def order_side(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # exact int64 cents (2-decimal grid): order-independent sums
        batch["total_c"] = np.round(
            batch["o_totalprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        g = batch.groupby("o_custkey", as_index=False).agg(
            p_n=("total_c", "size"), p_total=("total_c", "sum")
        )
        return pd.DataFrame(
            {
                "key": g["o_custkey"].astype("int64"),
                "side": 1,
                "p_n": g["p_n"].astype("int64"),
                "p_total": g["p_total"].astype("float64"),
            }
        )

    cust = read_clean(f"{sf_dir}/customer.parquet", ["c_custkey"]).map_batches(
        cust_side, batch_format="pandas", batch_size=65536
    )
    orders = read_clean(
        f"{sf_dir}/orders.parquet", ["o_custkey", "o_totalprice"]
    ).map_batches(order_side, batch_format="pandas", batch_size=65536)

    def left_merge(d: pd.DataFrame) -> pd.DataFrame:
        left = d[d["side"] == 0]
        agg = (
            d[d["side"] == 1]
            .groupby("key", as_index=False)
            .agg(n=("p_n", "sum"), total=("p_total", "sum"))
        )
        m = left[["key"]].merge(agg, on="key", how="left")
        return pd.DataFrame(
            {
                "c_custkey": m["key"].astype("int64"),
                "n_orders": m["n"].fillna(0).astype("int64"),
                # cents (exact ints riding in float64, each < 2^53) → dollars
                "total_spent": m["total"].fillna(0.0) / 100.0,
            }
        )

    # O(customers)-sized output: return the LAZY Dataset (d1/q15/q16
    # precedent) — the consumer collects or streams; no driver-side sort
    return partitioned_group_agg(cust.union(orders), keys=["key"], final=left_merge)


def q20_running_revenue(sf_dir: str, hot_threshold: int = _Q15_HOT_ROWS):
    """WINDOW FUNCTION (running sum) over a partitioned stream: each
    order's cumulative revenue for its customer in (date, orderkey)
    order — the ``SUM() OVER (PARTITION BY key ORDER BY ... ROWS
    UNBOUNDED PRECEDING)`` operator class. Revenue is carried as integer
    CENTS (``round(price*100)`` int64) so the prefix sums are bit-exact
    in BOTH engines regardless of accumulation order — float prefix sums
    are order-sensitive at the ulp level, which a value-hash compare
    would see.

    Dataflow form: co-partition by the window key, then one vectorized
    pass per partition (mergesort + per-key ``cumsum``); output is
    O(input) so the cold route returns the LAZY Dataset (d1 precedent).

    HOT KEYS: unlike lag (q16), cumsum's cross-row dependency is the
    ENTIRE prefix, so a hot key sub-splits by day-range bucket with a
    PER-BUCKET OFFSET instead of a one-row carry: per-(key, bucket) sums
    are tiny by construction (≤ n_hot × subparts rows reach the driver),
    an exclusive prefix over each key's occupied buckets gives every
    bucket its starting offset, and the broadcast offset table is merged
    into each (key, bucket) partition after its local cumsum. Exact
    under one-key-50% skew (stress test, tests/test_hot_keys.py)."""
    import numpy as np

    def cents_of(s: pd.Series) -> np.ndarray:
        return np.round(s.to_numpy(dtype="float64") * 100.0).astype("int64")

    def run_frame(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        run = (
            pd.Series(cents_of(d["o_totalprice"]), index=d.index)
            .groupby(d["o_custkey"], sort=False)
            .cumsum()
        )
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "o_custkey": d["o_custkey"].astype("int64"),
                "running_cents": run.astype("int64"),
            }
        )

    hot = hot_keys_for(f"{sf_dir}/orders.parquet", "o_custkey", hot_threshold)
    orders = read_clean(
        f"{sf_dir}/orders.parquet",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    if not hot:
        return partitioned_group_agg(orders, keys=["o_custkey"], final=run_frame)

    orders = orders.materialize()  # hot route reads it twice
    hot_ref = ray.put(set(hot))

    out_cold = partitioned_group_agg(
        orders.map_batches(
            lambda b: b[~b["o_custkey"].isin(ray.get(hot_ref))],
            batch_format="pandas",
        ),
        keys=["o_custkey"],
        final=run_frame,
    )

    hot_ds = orders.map_batches(
        lambda b: b[b["o_custkey"].isin(ray.get(hot_ref))],
        batch_format="pandas",
    ).materialize()
    from ray.data.aggregate import Max, Min

    bounds = hot_ds.aggregate(Min("o_orderdate"), Max("o_orderdate"))
    d_min = pd.Timestamp(bounds["min(o_orderdate)"]).value // 1000
    d_max = pd.Timestamp(bounds["max(o_orderdate)"]).value // 1000
    span = max(1, (d_max - d_min) // _Q16_SUBPARTS + 1)

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        us = b["o_orderdate"].astype("datetime64[us]").astype("int64")
        return b.assign(bkt=((us - d_min) // span).astype("int64"))

    bucketed = hot_ds.map_batches(add_bkt, batch_format="pandas")

    # per-(key, occupied bucket) SUM — bounded by n_hot × subparts rows;
    # the exclusive prefix over each key's occupied buckets is the
    # bucket's starting offset (one tiny groupby + shifted cumsum)
    def sum_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(p_c=cents_of(b["o_totalprice"])).groupby(
            ["o_custkey", "bkt"], as_index=False
        )["p_c"].sum()
        return g

    def sum_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_custkey", "bkt"], as_index=False)["p_c"].sum()

    # distributed combine first: the driver receives EXACTLY one row per
    # (hot key, occupied bucket) — n_hot × subparts — not per-batch partials
    bsums = (
        partitioned_group_agg(
            bucketed.map_batches(sum_partial, batch_format="pandas"),
            ["o_custkey", "bkt"],
            sum_final,
        )
        .to_pandas()
        .sort_values(["o_custkey", "bkt"], kind="mergesort")
    )
    csum = bsums.groupby("o_custkey", sort=False)["p_c"].cumsum()
    offsets = pd.DataFrame(
        {
            "o_custkey": bsums["o_custkey"].astype("int64"),
            "bkt": bsums["bkt"].astype("int64"),
            "offset": (csum - bsums["p_c"]).astype("int64"),
        }
    )
    off_ref = ray.put(offsets)

    def run_bucketed(d: pd.DataFrame) -> pd.DataFrame:
        # a coarse partition holds MANY (key, bucket) groups — possibly
        # several buckets of the same key — so the local cumsum groups by
        # (key, bucket); each bucket's prefix before its first row comes
        # entirely from its offset row (how="left" preserves row order)
        d = d.sort_values(
            ["o_custkey", "bkt", "o_orderdate", "o_orderkey"], kind="mergesort"
        ).merge(ray.get(off_ref), on=["o_custkey", "bkt"], how="left")
        local = (
            pd.Series(cents_of(d["o_totalprice"]), index=d.index)
            .groupby([d["o_custkey"], d["bkt"]], sort=False)
            .cumsum()
            .to_numpy()
        )
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "o_custkey": d["o_custkey"].astype("int64"),
                "running_cents": (
                    local + d["offset"].fillna(0).to_numpy(dtype="int64")
                ).astype("int64"),
            }
        )

    out_hot = partitioned_group_agg(
        bucketed, keys=["o_custkey", "bkt"], final=run_bucketed
    )

    # both sides LAZY before the union (materialized-union deadlock, d6)
    return out_cold.union(out_hot)


def q12b_approx_quantiles(sf_dir: str, n_bins: int = 256):
    """APPROXIMATE distributed quantiles via a mergeable equi-width
    histogram — the O(bins)-state sibling of q12's exact value-counts
    (whose state is O(distinct values): fine for 2-decimal prices,
    unbounded for continuous measures). Two narrow scans of one column —
    (min, max, n), then per-batch ``np.bincount`` into FIXED global bin
    edges — and the per-batch count vectors are mergeable by plain
    addition, so the combine is a 256-row shuffle no matter how many
    rows streamed by (the e9-HyperLogLog pattern, for ranks instead of
    distincts).

    The estimate is the LOWER EDGE of the bin holding rank ceil(q*n):
    bin choice is integer arithmetic on exact int64 counts, and the edge
    ``mn + k*w`` is one float multiply-add evaluated identically by
    numpy and the DuckDB oracle (both IEEE-754 doubles, same operation
    order), so the result hashes bit-exact despite being a float —
    while the error vs the TRUE quantile is ≤ one bin width by
    construction (gated against exact q12 in tests)."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    col = read_clean(f"{sf_dir}/orders.parquet", ["o_totalprice"])
    stats = col.aggregate(
        Min("o_totalprice"), Max("o_totalprice"), Count()
    )
    mn = float(stats["min(o_totalprice)"])
    mx = float(stats["max(o_totalprice)"])
    n = int(stats["count()"])
    w = (mx - mn) / n_bins

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(dtype="float64")
        # truncation == floor for the non-negative (v - mn) / w
        idx = np.minimum(((v - mn) / w).astype("int64"), n_bins - 1)
        return pd.DataFrame(
            {
                "bin": np.arange(n_bins, dtype="int64"),
                "c": np.bincount(idx, minlength=n_bins).astype("int64"),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", as_index=False)["c"].sum()

    hist = (
        partitioned_group_agg(
            col.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["bin"],
            combine,
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    cum = hist["c"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()

    def q_edge(q: float) -> float:
        rank = max(1, int(np.ceil(q * n)))
        k = int(bins[int(np.searchsorted(cum, rank, side="left"))])
        return mn + k * w

    return pd.DataFrame(
        {
            "p50": [q_edge(0.5)],
            "p90": [q_edge(0.9)],
            "p99": [q_edge(0.99)],
            "n_orders": [n],
        }
    )


def q14b_grouped_approx_quantiles(sf_dir: str, n_bins: int = 256):
    """APPROXIMATE quantiles PER GROUP via mergeable equi-width
    histograms — the grouped form of q12b, and the state shape the
    grouped-quantile problem actually wants at 100 TB: q14's exact path
    carries O(groups × distinct values) rows, this carries EXACTLY
    groups × n_bins int64 counts no matter how many rows stream by
    (per-batch ``bincount`` per group, merged by addition in a
    group-keyed combine; the final cumulative-rank read-off happens on
    the tiny groups × bins table). Bin edges are GLOBAL (one min/max
    pass), so every group's sketch is mergeable with every other's —
    the property a re-partition or late-arriving shard needs.

    Like q12b, the bin-edge estimate is integer-rank arithmetic plus one
    float multiply-add evaluated identically by numpy and DuckDB, so the
    op is oracle-paired despite being approximate; error ≤ one bin width
    per group (gated against exact q14 in tests)."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    col = read_clean(
        f"{sf_dir}/orders.parquet", ["o_orderpriority", "o_totalprice"]
    )
    stats = col.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    mn = float(stats["min(o_totalprice)"])
    mx = float(stats["max(o_totalprice)"])
    w = (mx - mn) / n_bins

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(dtype="float64")
        idx = np.minimum(((v - mn) / w).astype("int64"), n_bins - 1)
        g = pd.DataFrame(
            {"o_orderpriority": batch["o_orderpriority"], "bin": idx, "c": 1}
        ).groupby(["o_orderpriority", "bin"], as_index=False)["c"].sum()
        return g.astype({"bin": "int64", "c": "int64"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "bin"], as_index=False)["c"].sum()

    hist = (
        partitioned_group_agg(
            col.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["o_orderpriority"],  # group-keyed: each group's sketch lands whole
            combine,
        )
        .to_pandas()
        .sort_values(["o_orderpriority", "bin"])
        .reset_index(drop=True)
    )

    rows = []
    for prio, gh in hist.groupby("o_orderpriority", sort=True):
        cum = gh["c"].cumsum().to_numpy()
        bins = gh["bin"].to_numpy()
        n = int(cum[-1])

        def q_edge(q: float) -> float:
            rank = max(1, int(np.ceil(q * n)))
            k = int(bins[int(np.searchsorted(cum, rank, side="left"))])
            return mn + k * w

        rows.append((prio, q_edge(0.5), q_edge(0.9), n))
    return pd.DataFrame(
        rows, columns=["o_orderpriority", "p50", "p90", "n_orders"]
    ).astype({"n_orders": "int64"})
