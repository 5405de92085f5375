"""Bloom-filter operator properties: zero false negatives (the Bloom
guarantee), sane false-positive rate at the design point, and safe
degeneration on an empty build side."""

from __future__ import annotations

import pyspark.sql.functions as F

from gcs2postgres_spark.operators.bloom import bloom_build, bloom_prune


def test_bloom_never_false_negative(spark):
    keys = spark.range(0, 400, 7).withColumnRenamed("id", "k")  # 58 keys
    bloom = bloom_build(keys, "k")
    probe = spark.range(0, 400).withColumnRenamed("id", "k")
    passed = {r["k"] for r in bloom_prune(probe, bloom, "k").collect()}
    member = set(range(0, 400, 7))
    assert member <= passed, f"false negatives: {sorted(member - passed)[:5]}"
    # 1024 bits / 58 keys / 3 hashes → fp ≈ (1-e^(-174/1024))^3 ≈ 0.4%;
    # allow generous slack but catch a broken hash (which passes ~100%)
    fp = len(passed - member) / (400 - len(member))
    assert fp < 0.1, fp


def test_bloom_empty_build_prunes_everything(spark):
    empty = spark.range(0).withColumnRenamed("id", "k")
    bloom = bloom_build(empty, "k")
    probe = spark.range(50).withColumnRenamed("id", "k")
    assert bloom_prune(probe, bloom, "k").count() == 0


def test_bloom_flag_mode_keeps_all_rows(spark):
    keys = spark.range(5).withColumnRenamed("id", "k")
    bloom = bloom_build(keys, "k")
    probe = spark.range(20).withColumnRenamed("id", "k")
    flagged = bloom_prune(probe, bloom, "k", flag_col="hit")
    assert flagged.count() == 20
    assert flagged.filter(F.col("hit")).count() >= 5
