"""Bucketed co-located joins (sources/bucketing.py): same-bucketed tables
join WITHOUT a shuffle — the 100TB repeated-join layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_corrector_spark.sources.bucketing import (
    colocated_join,
    plan_has_shuffle,
    write_bucketed,
)
from ocr_corrector_spark.sources.transcripts import gen_transcripts


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf set by conftest's session factory
    df = gen_transcripts(spark, n_convs=60)
    dim = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("ts").alias("last_ts"),
    )
    write_bucketed(df.drop("probs"), "t_turns", ("conv_id",), n_buckets=8)
    write_bucketed(dim, "t_convs", ("conv_id",), n_buckets=8)
    return df, dim


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    out = colocated_join(spark, "t_turns", "t_convs", on="conv_id")
    assert not plan_has_shuffle(out), "bucketed equi-join must not shuffle"
    # and it still computes the right thing
    df, dim = bucketed_tables
    assert out.count() == df.count()
    got = (
        out.select("conv_id", "n_turns")
        .distinct()
        .orderBy("conv_id")
        .collect()
    )
    want = dim.select("conv_id", "n_turns").orderBy("conv_id").collect()
    assert got == want


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    # control: the same join on unbucketed frames (merge-hinted so a
    # broadcast cannot hide the exchange) DOES shuffle — proving the
    # assertion primitive detects what bucketing removes
    df, dim = bucketed_tables
    out = df.drop("probs").join(dim.hint("merge"), "conv_id")
    assert plan_has_shuffle(out)


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    # bucketing also feeds aggregations: grouping by the bucket key reuses
    # the scan's hash distribution
    agg = spark.table("t_turns").groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert not plan_has_shuffle(agg)
