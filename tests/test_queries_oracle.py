"""Regression guard: a representative subset of the driver-contract
queries compared against their DuckDB oracles at sf0.001 (the full set is
exercised by tools/check_queries.py at sf0.01)."""

import duckdb
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SUBSET = ["doc_verdicts", "lang_counts", "q1_lineitem", "dedup_first_events",
          "ref_events_supplier", "dedup_exact_docs", "sessions_per_user",
          "knn_embeddings", "asof_event_order", "minhash_planted_docs",
          "langid_planted_docs", "drift_events"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, ray_session, oracle_con):
    from tools.check_queries import to_pandas, compare
    import __ray_entry__ as e

    ray_df = to_pandas(e.queries()[name](SF))
    sql_df = oracle_con.execute(e.oracle_sql()[name]).fetchdf()
    assert compare(name, ray_df, sql_df) == "OK"


def test_every_query_has_docstring_and_runs_keys():
    import __ray_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)          # every oracle key has a query
    assert len(q) >= 25


def test_salted_groupby_matches_plain(ray_session):
    """Salted two-phase aggregation must equal the direct groupby."""
    import ray.data as rd
    from prompture_ray.stages.salted import salted_groupby_stats
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["lang", "n_chars"])
    salted = salted_groupby_stats(ds, "lang", "n_chars", n_salt=8) \
        .to_pandas().sort_values("lang", ignore_index=True)
    import duckdb
    plain = duckdb.sql(
        f"SELECT lang, count(*) AS n, sum(n_chars) AS sum_v, "
        f"min(n_chars) AS min_v, max(n_chars) AS max_v "
        f"FROM '{SF}/documents.parquet' GROUP BY lang ORDER BY lang"
    ).fetchdf()
    assert salted["n"].tolist() == plain["n"].tolist()
    assert salted["sum_v"].tolist() == plain["sum_v"].tolist()
    assert salted["min_v"].tolist() == plain["min_v"].tolist()
    assert salted["max_v"].tolist() == plain["max_v"].tolist()
