"""Wave-71 invariants: ABC boundaries and conservation."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_abc_boundaries_and_conservation(spark):
    from stakehouse_etl_spark.queries.catalog import QUERIES

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    rev = (
        (li.l_extendedprice * 100 + 0.5)
        .apply(math.floor)
        .groupby(li.l_partkey)
        .sum()
        .astype(int)
    )
    total = int(rev.sum())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    counts = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    cum = 0
    for _, c in ranked:
        if cum * 100 < total * 80:
            k = "A"
        elif cum * 100 < total * 95:
            k = "B"
        else:
            k = "C"
        counts[k][0] += 1
        counts[k][1] += c
        cum += c
    out = {r["abc"]: r for r in QUERIES["a_abc_classification"].fn(spark, SF).collect()}
    assert set(out) == {"A", "B", "C"}
    for k, (n, cents) in counts.items():
        assert out[k]["n_parts"] == n
        assert out[k]["cents"] == cents
        assert out[k]["revenue_share"] == cents / total
    # conservation + Pareto shape: A has fewer parts but more revenue
    assert sum(r["n_parts"] for r in out.values()) == len(rev)
    assert out["A"]["cents"] > out["C"]["cents"]
