"""Salted two-phase aggregation == plain aggregation (SURVEY §7.4.3:
head-term skew handling must be property-tested for equality)."""

import numpy as np
import pandas as pd

from pysearch.build import salted_sum


def test_salted_sum_equals_plain(spark):
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    # Zipfian-ish key skew: one head key dominating
    keys = np.concatenate([
        np.zeros(5000, dtype=np.int64),
        rng.randint(1, 400, size=5000),
    ])
    pdf = pd.DataFrame({
        "case_id": "0",
        "term": [f"t{k}" for k in keys],
        "n": rng.randint(1, 100, size=keys.size),
        "segment_id": rng.randint(0, 64, size=keys.size),
    })
    df = spark.createDataFrame(pdf)
    salted = salted_sum(
        df, ["case_id", "term"], {"n": "total"}, salt_col=F.col("segment_id")
    ).orderBy("term").collect()
    plain = (
        df.groupBy("case_id", "term").agg(F.sum("n").alias("total"))
        .orderBy("term").collect()
    )
    assert [(r["term"], r["total"]) for r in salted] == [
        (r["term"], r["total"]) for r in plain
    ]
    assert len(salted) == 400
