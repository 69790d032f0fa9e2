"""Hot-key sub-splitting stress tests (round-3 VERDICT #3): one key holds
~50% of all rows, the hot routes of e5/e6/q15 engage (tiny thresholds),
and the outputs must stay EXACTLY equal to the DuckDB oracle — the same
comparison the driver applies to the uniform tables."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tools.check_oracles import compare, to_pandas


@pytest.fixture(scope="module")
def skewed_events_dir(tmp_path_factory):
    """events.parquet where user 7 owns ~50% of all events, interleaved
    click/view/error with equal-timestamp collisions sprinkled in."""
    d = tmp_path_factory.mktemp("skewed_events")
    rng = np.random.RandomState(42)
    n = 20_000
    user = np.where(rng.rand(n) < 0.5, 7, rng.randint(0, 50, size=n))
    base = pd.Timestamp("2024-03-01").value // 1000
    # microsecond offsets over ~10 days, with duplicates (coarse grid)
    off = rng.randint(0, 10 * 86400, size=n).astype("int64") * 1_000_000
    ts = pd.to_datetime(base + off, unit="us")
    etype = rng.choice(
        ["click", "view", "error", "signup", "purchase"],
        size=n,
        p=[0.25, 0.3, 0.2, 0.15, 0.1],
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": user.astype("int64"),
            "ts": ts.astype("datetime64[us]"),
            "event_type": etype,
            "value": np.round(rng.rand(n) * 100, 4),
        }
    )
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def skewed_orders_dir(tmp_path_factory):
    """orders.parquet where customer 3 owns ~50% of all orders."""
    d = tmp_path_factory.mktemp("skewed_orders")
    rng = np.random.RandomState(43)
    n = 10_000
    cust = np.where(rng.rand(n) < 0.5, 3, rng.randint(0, 200, size=n))
    base = pd.Timestamp("1995-01-01").value // 1000
    off = rng.randint(0, 2000, size=n).astype("int64") * 86_400_000_000
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": cust.astype("int64"),
            "o_totalprice": np.round(rng.rand(n) * 10_000, 2),
            "o_orderdate": pd.to_datetime(base + off, unit="us").astype(
                "datetime64[us]"
            ),
        }
    )
    df.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _oracle(con, sql):
    return con.execute(sql).fetchdf()


def test_e5_asof_hot_route_exact(ray_session, skewed_events_dir):
    from simple_crawler_ray.pipelines.events import e5_asof_join

    # threshold far below user 7's ~10k rows → hot route engages
    ours = to_pandas(e5_asof_join(skewed_events_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_events_dir}/events.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["e5_asof_join"])
    problems = compare("e5_hot", ours, oracle)
    assert not problems, problems
    # the skew actually exercised the sub-split: hot user present on
    # both probe and build sides
    assert (ours["user_id"] == 7).sum() > 500


def test_e6_range_hot_route_exact(ray_session, skewed_events_dir):
    from simple_crawler_ray.pipelines.events import e6_range_join

    ours = to_pandas(e6_range_join(skewed_events_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_events_dir}/events.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["e6_range_join"])
    problems = compare("e6_hot", ours, oracle)
    assert not problems, problems
    assert (ours["user_id"] == 7).sum() > 1000


def test_e1_sessionize_hot_route_exact(ray_session, skewed_events_dir):
    """Sessionization under skew: the ts-bucket sub-split + boundary
    merge must reproduce the window-function oracle exactly, including
    sessions that span bucket cuts."""
    from tools.check_oracles import to_pandas

    from simple_crawler_ray.pipelines.events import e1_sessionize

    ours = to_pandas(e1_sessionize(skewed_events_dir, hot_threshold=500))
    ours = ours.sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_events_dir}/events.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["e1_sessionize"])
    problems = compare("e1_hot", ours, oracle)
    assert not problems, problems
    assert int(ours.loc[ours["user_id"] == 7, "n_events"].iloc[0]) > 5000


def test_e8_funnel_hot_route_exact(ray_session, skewed_events_dir):
    """Funnel under skew: the staged salted route must match the chained
    min-ts oracle exactly."""
    from tools.check_oracles import to_pandas

    from simple_crawler_ray.pipelines.events import e8_funnel

    ours = to_pandas(e8_funnel(skewed_events_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skewed_events_dir}/events.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["e8_funnel"])
    problems = compare("e8_hot", ours, oracle)
    assert not problems, problems


def test_q15_salted_route_exact(ray_session, skewed_orders_dir):
    from simple_crawler_ray.pipelines.relational import q15_above_customer_avg

    ours = to_pandas(q15_above_customer_avg(skewed_orders_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{skewed_orders_dir}/orders.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["q15_above_customer_avg"])
    problems = compare("q15_hot", ours, oracle)
    assert not problems, problems
    assert (ours["o_custkey"] == 3).sum() > 500


def test_q16_lag_hot_route_exact(ray_session, skewed_orders_dir):
    """LAG under skew: day-bucket sub-split with the one-row carry must
    match the window-function oracle exactly — including gaps that span
    bucket cuts and date ties at the cut."""
    from simple_crawler_ray.pipelines.relational import q16_order_date_lag

    ours = to_pandas(q16_order_date_lag(skewed_orders_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{skewed_orders_dir}/orders.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["q16_order_date_lag"])
    problems = compare("q16_hot", ours, oracle)
    assert not problems, problems
    assert (ours["o_custkey"] == 3).sum() > 500


def test_q20_running_hot_route_exact(ray_session, skewed_orders_dir):
    """Running sum under skew: the day-bucket sub-split must seed every
    bucket with the exclusive-prefix offset of the key's earlier buckets
    — including several buckets of one key hashing into one coarse
    partition — and match the window-function oracle bit-exactly (the
    integer-cents representation makes prefix sums order-insensitive)."""
    from simple_crawler_ray.pipelines.relational import q20_running_revenue

    ours = to_pandas(q20_running_revenue(skewed_orders_dir, hot_threshold=500))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{skewed_orders_dir}/orders.parquet')"
    )
    oracle = _oracle(con, entrymod.oracle_sql()["q20_running_revenue"])
    problems = compare("q20_hot", ours, oracle)
    assert not problems, problems
    assert (ours["o_custkey"] == 3).sum() > 500


def test_hot_key_census_bounded(ray_session, skewed_events_dir):
    """hot_keys returns exactly the above-threshold keys and nothing else."""
    import ray.data as rd

    from simple_crawler_ray.pipelines.io import read_clean
    from simple_crawler_ray.pipelines.relational import hot_keys

    ds = read_clean(f"{skewed_events_dir}/events.parquet", ["user_id"])
    truth = (
        ds.to_pandas()["user_id"].value_counts()
    )
    for thr in (500, 5_000):
        hot = hot_keys(ds, "user_id", thr)
        expected = {int(k): int(v) for k, v in truth[truth > thr].items()}
        assert hot == expected, (thr, hot, expected)
