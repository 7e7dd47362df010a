"""Driver-conformance tests: every queries() entry runs at sf0.01 and the
SQL-checked ones match DuckDB on rows + schema + values — a local mirror
of the driver's CORRECTNESS gate."""

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent")


@pytest.fixture(scope="session")
def duck(ray_session):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def test_sql_checked_queries_match_duckdb(duck):
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    failures = []
    for name, sql in osql.items():
        a = _norm(_to_pandas(qs[name](SF_DIR)))
        b = _norm(duck.sql(sql).df())
        if len(a) != len(b):
            failures.append(f"{name}: rows {len(a)} != {len(b)}")
        elif list(a.columns) != list(b.columns):
            failures.append(f"{name}: cols {list(a.columns)} != {list(b.columns)}")
        elif not a.astype(str).equals(b.astype(str)):
            failures.append(f"{name}: values differ")
    assert not failures, failures


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    for name in set(qs) - set(osql):
        res = _to_pandas(qs[name](SF_DIR))
        assert res is not None, name
        assert len(res.columns) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as E

    res = _to_pandas(E.entry())
    assert len(res) > 0
    assert list(res.columns) == ["query_id", "rank", "doc_id", "score"]
    # rank 1 is the best score within each query
    for _, g in res.groupby("query_id"):
        assert (g.sort_values("rank")["score"].diff().dropna() <= 1e-12).all()
