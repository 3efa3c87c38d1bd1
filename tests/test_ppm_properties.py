"""Property pin for the shared exactness contract: the engine's
half-away-from-zero ppm (`queries._ppm`) must equal DuckDB's HUGEINT
expression `sign * ((2*|num|*1e6 + den) // (2*den))` for every int
pair — all 200+ ppm-valued oracle entries assume this identity, so it
gets its own hypothesis sweep (including the .5-boundary rationals
where half-even vs half-away and floor- vs truncate-division differ)."""

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from bitquery_kafka_streams_rust_ray.pipelines.queries import _ppm


@settings(deadline=None)
@given(num=st.integers(min_value=-10**12, max_value=10**12),
       den=st.integers(min_value=1, max_value=10**9))
def test_ppm_matches_duckdb_expression(num, den):
    got = int(_ppm(np.array([num], object), np.array([den], object))[0])
    want = duckdb.sql(
        f"SELECT CASE WHEN {num} < 0 THEN "
        f"-CAST((2 * CAST({-num if num < 0 else num} AS HUGEINT) "
        f"* 1000000 + {den}) // (2 * CAST({den} AS HUGEINT)) AS BIGINT) "
        f"ELSE CAST((2 * CAST({num} AS HUGEINT) * 1000000 + {den}) "
        f"// (2 * CAST({den} AS HUGEINT)) AS BIGINT) END"
    ).fetchone()[0]
    assert got == int(want), (num, den)


@given(k=st.integers(min_value=0, max_value=10**12))
@settings(deadline=None)
def test_ppm_exact_half_boundary(k):
    """num/den scaled to ppm lands EXACTLY on k + 1/2: half-away
    rounds the .5 up (to k+1) on both signs — the boundary where
    numpy's half-even and a float division would disagree."""
    num, den = 2 * k + 1, 2_000_000
    got = int(_ppm(np.array([num], object), np.array([den], object))[0])
    assert got == k + 1
    got_neg = int(_ppm(np.array([-num], object),
                       np.array([den], object))[0])
    assert got_neg == -(k + 1)
