"""Round-5 TPC-H-shaped additions (q6/q9/q12/q13/q15/q17/q20): each
engine composition must reproduce its DuckDB oracle exactly at sf0.001
(order-insensitive, typed — same discipline as the driver's value hash).

Shapes covered:
- q6: predicate + scalar aggregate scan (no shuffle of fact rows)
- q9: broadcast dims + one fact-fact hash join + 2-key groupby
- q12: fact-fact join + date-arithmetic filter + pivoted counts
- q13: fact groupby + LEFT join zero-fill + distribution-of-counts
- q15: keyed partials + dimension-sized max-with-ties driver fold
- q17: two-pass aggregate-then-rejoin with broadcast thresholds
- q20: two-key pair groupby + broadcast part totals + pair filter
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("customer", "orders", "lineitem", "supplier", "nation",
          "region", "part")

NEW_QUERIES = [
    "q6_forecast_revenue",
    "q9_nation_profit",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_heavy_shippers",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle_exactly(name, duck, ray_session):
    import __ray_entry__ as e

    got = e.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = _canon(got)
    want = _canon(duck.execute(e.oracle_sql()[name]).fetchdf())
    assert len(got) == len(want), (name, len(got), len(want))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        # driver-strict: typed comparison, no float coercion
        assert a.dtype == b.dtype, (name, c, a.dtype, b.dtype)
        assert np.array_equal(a, b), (name, c)


def test_q13_zero_order_customers_present(duck, ray_session):
    """The LEFT join must surface customers with no qualifying orders
    as c_count = 0 (the join's null path, not a dropped row)."""
    import __ray_entry__ as e

    got = e.queries()["q13_customer_order_distribution"](SF).to_pandas()
    n_cust = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert int(got["custdist"].sum()) == int(n_cust)


def test_q15_ties_kept(ray_session):
    """Max-with-ties: every returned supplier carries the same (max)
    revenue."""
    import __ray_entry__ as e

    got = e.queries()["q15_top_supplier"](SF)
    assert got["total_revenue_cents"].nunique() == 1
    assert len(got) >= 1
