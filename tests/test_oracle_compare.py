"""Driver-style correctness gate: run every queries() entry at sf0.001
and compare with its oracle_sql() via DuckDB (row count + column names +
order-insensitive values), mirroring CORRECTNESS_r{N}.json semantics.
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FTR_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            np.testing.assert_array_equal(g[c].to_numpy(), e[c].to_numpy(),
                                          err_msg=f"{name}.{c}")
        else:
            assert g[c].tolist() == e[c].tolist(), f"{name}.{c} differs"


def _entry_module():
    import importlib

    spec = importlib.util.spec_from_file_location(
        "ray_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ENTRY = _entry_module()
QUERIES = ENTRY.queries()
ORACLES = ENTRY.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(ray_session, name):
    got = _to_df(QUERIES[name](SF_DIR))
    exp = _duck(ORACLES[name])
    _compare(name, got, exp)


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES


def test_entry_smoke(ray_session):
    res = ENTRY.entry()
    df = _to_df(res)
    assert len(df) >= 0 and len(df.columns) > 0
