"""Driver-contract checks: every queries() entry runs at sf0.001; entries
with an oracle_sql() are compared against DuckDB exactly (the same
row-count/schema/value comparison the driver applies)."""

import duckdb
import pytest

import __ray_entry__ as entrymod
from tools.check_oracles import TABLES, compare, to_pandas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_query_and_oracle_keys_consistent():
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    # the rows-only set is exactly the non-SQL-expressible ops
    assert set(qs) - set(sqls) == {
        "c1_crawl_order",
        "c2_crawl_seen",
        "c3_crawl_urls_out",
        "c4_sitemaps_out",
        "d2_minhash_lsh",
        "d3_simhash",
        "s2_ann_lsh",
    }


_ORACLE_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(ray_session, con, name):
    ours = to_pandas(entrymod.queries()[name](SF_DIR))
    oracle = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare(name, ours, oracle)
    assert not problems, problems


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    for name in ("d2_minhash_lsh", "d3_simhash", "s2_ann_lsh"):
        df = to_pandas(qs[name](SF_DIR))
        assert df is not None


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert out.num_rows > 0
    assert out.schema.names == [
        "seq",
        "url",
        "depth",
        "parent_url",
        "req_status",
        "crawl_status",
    ]
