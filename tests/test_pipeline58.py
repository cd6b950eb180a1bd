"""Wave-58 invariants: Zipf slope vs unquantized OLS, CV² identities."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_zipf_slope_close_to_unquantized(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = Counter(w for t in docs.text for w in t.split(" ") if w)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r = QUERIES["text_zipf_slope"].fn(spark, SF).collect()[0]
    assert r["n"] == n
    # quantization error is bounded by ~1e-5 on this fit
    assert abs(r["zipf_slope"] - slope) < 1e-4
    assert r["zipf_slope"] < 0  # frequency falls with rank


def test_interarrival_cv_ground_truth(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    df = pd.DataFrame({"u": ev.user_id, "us": us, "e": ev.event_id}).sort_values(
        ["u", "us", "e"]
    )
    out = QUERIES["ts_interarrival_cv"].fn(spark, SF).collect()
    scores = {r["user_id"]: r for r in out}
    for uid, grp in df.groupby("u"):
        gaps = grp.us.diff().dropna().astype(int)
        if len(gaps) < 2 or int(uid) not in scores:
            continue
        gm = gaps // 1000
        n, sm, ssm = len(gm), int(gm.sum()), int((gm**2).sum())
        cv2 = (n * ssm - sm * sm) / (sm * sm)
        r = scores[int(uid)]
        assert r["n"] == n
        assert r["total_gap_us"] == int(gaps.sum())
        assert r["cv2_micro"] == math.floor(cv2 * 1e6)
    micro = [r["cv2_micro"] for r in out]
    assert micro == sorted(micro, reverse=True)
