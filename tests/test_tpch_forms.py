"""TPC-H Q5/Q8/Q10/Q14/Q18 analog forms: invariants on sf0.001."""

from pyspark.sql import functions as F


def test_returned_items_top20_and_flag(spark, sf0001):
    from linkgraph.entry_queries import q_returned_items

    rows = q_returned_items(spark, sf0001).collect()
    assert 0 < len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len({r["c_custkey"] for r in rows}) == len(rows)


def test_local_supplier_volume_nations_in_region(spark, sf0001):
    from linkgraph.entry_queries import Q5_REGION, q_local_supplier_volume

    rows = q_local_supplier_volume(spark, sf0001).collect()
    nation = spark.read.parquet(f"{sf0001}/nation.parquet")
    region = spark.read.parquet(f"{sf0001}/region.parquet")
    asia = {
        r["n_name"]
        for r in nation.join(
            region.where(F.col("r_name") == Q5_REGION),
            nation["n_regionkey"] == region["r_regionkey"],
        ).collect()
    }
    assert rows
    for r in rows:
        assert r["n_name"] in asia
        assert r["revenue"] > 0


def test_market_share_is_a_fraction(spark, sf0001):
    from linkgraph.entry_queries import q_market_share

    rows = q_market_share(spark, sf0001).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_rev"] > 0


def test_promo_revenue_pct_bounds_and_items(spark, sf0001):
    from linkgraph.entry_queries import q_promo_revenue

    rows = q_promo_revenue(spark, sf0001).collect()
    assert rows
    li_n = spark.read.parquet(f"{sf0001}/lineitem.parquet").count()
    assert sum(r["n_items"] for r in rows) == li_n  # every item lands in a month
    for r in rows:
        assert 0.0 <= r["promo_pct"] <= 100.0


def test_large_volume_customers_threshold(spark, sf0001):
    from linkgraph.entry_queries import Q18_QTY, q_large_volume_customers

    rows = q_large_volume_customers(spark, sf0001).collect()
    li = spark.read.parquet(f"{sf0001}/lineitem.parquet")
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > Q18_QTY)
        .count()
    )
    assert len(rows) == expect
    for r in rows:
        assert r["sum_qty"] > Q18_QTY
