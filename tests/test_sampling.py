"""Deterministic sampling + shard packing unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    pack_into_shards,
)


def test_hash_sample_deterministic_and_layout_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 0.25).collect()}
    b = {r["k"] for r in hash_sample(df.repartition(7), "k", 0.25).collect()}
    assert a == b  # membership is a function of the key, not the layout
    assert 0.18 < len(a) / 2000 < 0.32


def test_hash_sample_subset_monotone(spark):
    # raising the rate only ever adds rows — the property that makes
    # hash-mod samples reusable across experiments
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = {r["k"] for r in hash_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.3).collect()}
    assert small <= big


def test_hash_sample_stratified_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = hash_sample(df, "k", 0.1, strata_col="s", fractions={"true": 0.5}).collect()
    by = {"true": 0, "false": 0}
    for r in out:
        by[r["s"]] += 1
    assert 0.40 < by["true"] / 1500 < 0.60
    assert 0.05 < by["false"] / 1500 < 0.16


def test_pack_into_shards_matches_global_prefix_sum(spark):
    df = spark.range(0, 500).select(F.col("id"), (F.col("id") % 7 + 1).alias("w"))
    got = {r["id"]: r["shard_id"] for r in pack_into_shards(df, "id", "w", budget=50).collect()}
    # oracle: single-pass exclusive prefix sum on the driver
    rows = sorted((r["id"], r["w"]) for r in df.collect())
    acc = 0
    for i, w in rows:
        assert got[i] == acc // 50, f"id={i}"
        acc += w
    # shards fill to ~budget: every shard except the last overflows 50 only
    # by at most one row's weight
    assert len(set(got.values())) == (acc - 1) // 50 + 1


def test_pack_into_shards_partition_count_invariant(spark):
    df = spark.range(0, 300).select(F.col("id"), F.lit(3).alias("w"))
    a = {(r["id"], r["shard_id"]) for r in pack_into_shards(df, "id", "w", 30, num_partitions=2).collect()}
    b = {(r["id"], r["shard_id"]) for r in pack_into_shards(df, "id", "w", 30, num_partitions=13).collect()}
    assert a == b


def test_hash_bucket_portable_value(spark):
    import hashlib

    row = spark.range(42, 43).select(hash_bucket(F.col("id")).alias("b")).head()
    assert row["b"] == int(hashlib.md5(b"42").hexdigest()[:4], 16)


def test_stratified_prefix_sum_matches_per_stratum_window(spark):
    from pyspark.sql import Window

    from universal_aws_data_pipeline_spark.operators.sampling import stratified_prefix_sum

    df = spark.range(0, 400).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        ((F.col("id") * 7) % 11 + 1).alias("w"),
    )
    got = {
        (r["id"], r["cum_before"])
        for r in stratified_prefix_sum(
            df, "grp", [F.col("w").desc(), F.col("id")], "w", num_partitions=7
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("w").desc(), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["id"], r["cum_before"])
        for r in df.withColumn("cum_before", F.sum("w").over(w) - F.col("w")).collect()
    }
    assert got == want


def test_stratified_prefix_sum_partition_count_invariant(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import stratified_prefix_sum

    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("grp"), F.lit(5).alias("w")
    )
    a = {
        (r["id"], r["cum_before"])
        for r in stratified_prefix_sum(df, "grp", [F.col("id")], "w", num_partitions=2).collect()
    }
    b = {
        (r["id"], r["cum_before"])
        for r in stratified_prefix_sum(df, "grp", [F.col("id")], "w", num_partitions=17).collect()
    }
    assert a == b


def test_theta_sketch_estimate_error_bound(spark):
    """q90's θ=1/4 KMV estimate must track the exact distinct count (the
    sketch analogue of the ANN recall gate). Runs at sf0.1 — D=1500 per
    type, so θ·D ≈ 375 kept hashes and expected relative error
    ~1/sqrt(θ·D) ≈ 5%; the 20% gate is ~4σ. (At sf0.001 D is only 15:
    a θ-sample of ~4 hashes estimates nothing — sketches need scale.)"""
    import os

    import pytest as _pytest

    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES, _t

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        _pytest.skip("sf0.1 fixtures not present")
    est = {
        r["event_type"]: r["est_distinct_users"]
        for r in QUERIES["q90_theta_distinct_sketch"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for etype, d in exact.items():
        rel = abs(est[etype] - d) / d
        assert rel < 0.2, f"{etype}: est={est[etype]} exact={d} rel_err={rel:.3f}"
