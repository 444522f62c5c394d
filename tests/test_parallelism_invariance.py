"""Determinism under parallelism for the round-2 continuation operators:
the same input at 1 partition and 16 partitions must produce identical rows
(the north rule's N-vs-4N exact-match property, operator by operator)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _pts(spark, n, parts):
    rng = np.random.default_rng(41)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.random((n, 2)))]
    return spark.createDataFrame(rows, "vec_id long, x double, y double").repartition(parts)


def _docs(spark, n, parts):
    rows = [
        (i, f"doc {i % 13} shares words alpha beta {'gamma ' * (i % 5)} tail {i % 7}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


@pytest.mark.parametrize("op", ["hex_assign", "hex_density", "hex_pyramid", "hex_soft"])
def test_hex_ops_partition_invariant(spark, op):
    from raptor_rag_spark.operators import hexgrid

    fn = {
        "hex_assign": lambda df: hexgrid.hex_assign(df, res=5),
        "hex_density": lambda df: hexgrid.hex_density(df.select("x", "y"), res=4),
        "hex_pyramid": lambda df: hexgrid.hex_pyramid(df.select("x", "y"), res=5, levels=3),
        "hex_soft": lambda df: hexgrid.hex_soft_assign(df, res=5, eps=0.2),
    }[op]
    a = {tuple(r) for r in fn(_pts(spark, 400, 1)).collect()}
    b = {tuple(r) for r in fn(_pts(spark, 400, 16)).collect()}
    assert a == b


def test_s2_and_winnow_partition_invariant(spark):
    from raptor_rag_spark.operators.dedup import winnow_matches
    from raptor_rag_spark.operators.s2 import s2_cells

    def geo(df):
        return df.select(
            "vec_id",
            ((F.col("x") - 0.5) * 6.28).alias("lon"),
            ((F.col("y") - 0.5) * 3.14).alias("lat"),
        )

    a = {tuple(r) for r in s2_cells(geo(_pts(spark, 300, 1)), res=6).collect()}
    b = {tuple(r) for r in s2_cells(geo(_pts(spark, 300, 16)), res=6).collect()}
    assert a == b

    wa = {tuple(r) for r in winnow_matches(_docs(spark, 80, 1), min_shared=1).collect()}
    wb = {tuple(r) for r in winnow_matches(_docs(spark, 80, 16), min_shared=1).collect()}
    assert wa == wb and wa  # non-trivial: the synthetic docs do share runs


def test_cdc_and_quality_rank_partition_invariant(spark):
    from raptor_rag_spark.operators.dedup import cdc_chunks
    from raptor_rag_spark.operators.sampling import quality_rank

    ca = {tuple(r) for r in cdc_chunks(_docs(spark, 60, 1)).collect()}
    cb = {tuple(r) for r in cdc_chunks(_docs(spark, 60, 16)).collect()}
    assert ca == cb

    qa = {tuple(r) for r in quality_rank(_docs(spark, 120, 1)).collect()}
    qb = {tuple(r) for r in quality_rank(_docs(spark, 120, 16)).collect()}
    assert qa == qb


def test_round3_ops_partition_invariant(spark):
    """The round-3 statistics are aggregate-first with DECIMAL sums and
    unique-key tiebreaks — identical rows at 1 vs 16 partitions."""
    from raptor_rag_spark.operators.layout import str_layout
    from raptor_rag_spark.operators.pointpattern import cell_skew
    from raptor_rag_spark.operators.ranking import maxscore_rank
    from raptor_rag_spark.operators.scanstat import spatial_scan

    def scan(df):
        return spatial_scan(
            df.select(
                "x", "y", (F.pmod(F.col("vec_id"), F.lit(7)) == 0).alias("is_case")
            ),
            res=4,
            rmax=2,
            top_k=10,
        )

    a = {tuple(r) for r in scan(_pts(spark, 500, 1)).collect()}
    b = {tuple(r) for r in scan(_pts(spark, 500, 16)).collect()}
    assert a == b and len(a) == 10

    sa = {tuple(r) for r in str_layout(_pts(spark, 500, 1), page_cap=32).collect()}
    sb = {tuple(r) for r in str_layout(_pts(spark, 500, 16), page_cap=32).collect()}
    assert sa == sb and len(sa) == 500

    ka = cell_skew(_pts(spark, 500, 1).select("x", "y"), res=5).collect()
    kb = cell_skew(_pts(spark, 500, 16).select("x", "y"), res=5).collect()
    assert [tuple(r) for r in ka] == [tuple(r) for r in kb]

    qs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma tail")], "query_id INT, qtext STRING"
    )
    ma = {tuple(r) for r in maxscore_rank(_docs(spark, 120, 1), qs, top_k=5).collect()}
    mb = {tuple(r) for r in maxscore_rank(_docs(spark, 120, 16), qs, top_k=5).collect()}
    assert ma == mb and ma
