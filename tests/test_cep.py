"""CEP operators: funnel (ordered sequence) and absence matches vs a
brute-force single-process oracle on synthetic event logs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.cep import absence_match, funnel_match

pytestmark = pytest.mark.usefixtures("ray_session")

US = 1_000_000
H = 3600 * US


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    return df[["event_id", "user_id", "ts", "event_type"]]


def _oracle_funnel(df, pattern, within_us):
    """Greedy earliest chain per key, strict >, within filter at end."""
    out = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        types = g["event_type"].to_numpy()
        t = None
        chain = []
        for stage in pattern:
            cand = [
                v for v, ty in zip(ts, types)
                if ty == stage and (t is None or v > t)
            ]
            if not cand:
                chain = None
                break
            t = min(cand)
            chain.append(t)
        if chain and chain[-1] - chain[0] <= within_us:
            out.append((uid, chain[0], chain[-1]))
    return sorted(out)


def test_funnel_matches_bruteforce():
    rng = np.random.default_rng(7)
    rows = []
    types = ["view", "click", "purchase", "error"]
    for uid in range(40):
        for _ in range(rng.integers(1, 12)):
            rows.append(
                (uid, int(rng.integers(0, 200 * H)), types[rng.integers(4)])
            )
    df = _events(rows)
    got = funnel_match(
        rd.from_pandas(df), "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_s=72 * 3600,
        tiebreak_col="event_id", shards=8,
    ).to_pandas()
    got_t = sorted(
        (int(r.user_id),
         int(pd.Timestamp(r.start_ts).value // 1000),
         int(pd.Timestamp(r.end_ts).value // 1000))
        for r in got.itertuples()
    )
    assert got_t == _oracle_funnel(df, ["view", "click", "purchase"],
                                   72 * 3600 * US)


def test_funnel_strict_order_and_within():
    # equal-ts stages never chain (strict >); within is inclusive <=
    rows = [
        (1, 0, "view"), (1, 0, "click"), (1, H, "click"), (1, 2 * H, "purchase"),
        (2, 0, "view"), (2, H, "click"), (2, 73 * H, "purchase"),  # too slow
        (3, 0, "view"), (3, H, "click"), (3, 72 * H, "purchase"),  # boundary
        (4, 5 * H, "click"), (4, 6 * H, "purchase"),  # no chain start
    ]
    got = funnel_match(
        rd.from_pandas(_events(rows)), "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_s=72 * 3600, shards=4,
    ).to_pandas()
    assert sorted(got["user_id"].tolist()) == [1, 3]
    u1 = got[got["user_id"] == 1].iloc[0]
    assert pd.Timestamp(u1["start_ts"]).value // 1000 == 0
    assert pd.Timestamp(u1["end_ts"]).value // 1000 == 2 * H


def test_absence_match_timeout():
    rows = [
        (1, 0, "view"), (1, H // 2, "click"),     # followed -> no emit
        (1, 10 * H, "view"),                      # nothing after -> emit
        (2, 0, "view"), (2, 0, "click"),          # same-ts doesn't count
        (2, 5 * H, "view"), (2, 7 * H, "click"),  # outside 1h -> emit
    ]
    df = _events(rows)
    got = absence_match(
        rd.from_pandas(df), "user_id", "ts", "event_type",
        trigger="view", followup="click", within_s=3600,
        id_cols=["event_id"], shards=4,
    ).to_pandas()
    want = df[(df["event_type"] == "view")
              & (df["event_id"] != 0)]["event_id"].tolist()
    assert sorted(got["event_id"].tolist()) == sorted(want)
