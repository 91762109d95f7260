"""Bucket-checksum table diff: identical tables produce an empty plan,
planted inserts/deletes/updates are classified exactly, nulls are
distinguished from their string spellings."""

import pytest
from pyspark.sql import functions as F

from linkgraph.operators.reconcile import table_diff


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(200)], "k long, a string, x double"
    )


def test_identical_tables_diff_empty(base):
    assert table_diff(base, base, ["k"]).count() == 0


def test_planted_changes_classified(spark, base):
    right = (
        base.where(F.col("k") != 7)  # delete 7
        .withColumn(
            "x", F.when(F.col("k") == 11, F.lit(99.0)).otherwise(F.col("x"))
        )  # change 11
        .unionByName(
            spark.createDataFrame([(999, "new", 1.0)], "k long, a string, x double")
        )  # insert 999
    )
    got = {r["k"]: r["status"] for r in table_diff(base, right, ["k"]).collect()}
    assert got == {7: "left_only", 11: "changed", 999: "right_only"}


def test_null_vs_string_null_distinct(spark):
    l = spark.createDataFrame([(1, None), (2, "\x00")], "k long, a string")
    r = spark.createDataFrame([(1, "\x00"), (2, "\x00")], "k long, a string")
    got = {r_["k"]: r_["status"] for r_ in table_diff(l, r, ["k"]).collect()}
    assert got == {1: "changed"}


def test_key_only_tables(spark):
    l = spark.createDataFrame([(1,), (2,)], "k long")
    r = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r_["k"]: r_["status"] for r_ in table_diff(l, r, ["k"]).collect()}
    assert got == {1: "left_only", 3: "right_only"}
