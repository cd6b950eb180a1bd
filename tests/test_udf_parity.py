"""Arrow-batched Python UDF parity (SURVEY §2.10).

The relational core deliberately contains NO Python UDFs — but the
multimodal/decode tier runs on mapInPandas, so prove the Arrow path
produces bit-identical results to the JVM expressions for a
representative kernel (token counting). This pins the contract that
dropping to pandas when genuinely needed does not change semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from stakehouse_etl_spark.io.sources import load_table
from stakehouse_etl_spark.operators.text import token_count


def test_mapinpandas_token_count_matches_jvm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.strip().str.lower().str.split(r"\s+")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_tokens": toks.str.len()}
            )

    arrow = {
        r["doc_id"]: r["n_tokens"]
        for r in docs.mapInPandas(
            count_tokens, "doc_id long, n_tokens long"
        ).collect()
    }
    jvm = {
        r["doc_id"]: r["n_tokens"]
        for r in docs.select(
            "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
        ).collect()
    }
    assert arrow == jvm
