"""Physical-plan guards for the second round-5 wave: promised perf
properties must be visible in the plan (sf0.001 driver fixtures)."""


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_returned_items_broadcasts_nation_not_customer(spark, sf0001):
    from linkgraph.entry_queries import q_returned_items

    plan = _plan(q_returned_items(spark, sf0001))
    # 25-row nation broadcasts; the flag/date filters reach the scans
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan


def test_moving_stats_aggregates_before_window(spark, sf0001):
    from linkgraph.entry_queries import q_moving_stats

    plan = _plan(q_moving_stats(spark, sf0001))
    # the day rollup (HashAggregate) must feed the Window, not the other
    # way round: windows run over #days rows only.  The formatted tree
    # prints DOWNSTREAM-first, so the Window line precedes its upstream
    # aggregate
    assert plan.index("Window") < plan.index("HashAggregate")


def test_peak_hour_window_is_partitioned_by_user(spark, sf0001):
    from linkgraph.entry_queries import q_peak_hour_load

    plan = _plan(q_peak_hour_load(spark, sf0001))
    # both the RANGE frame and the argmax run inside user_id partitions —
    # no global (empty-partition-spec) window over raw events
    win = plan[plan.index("Window") :]
    assert "user_id" in win.split("Arguments")[1][:400]


def test_eb_rates_single_rollup_and_broadcast_scalars(spark, sf0001):
    from linkgraph.entry_queries import q_eb_source_rates

    plan = _plan(q_eb_source_rates(spark, sf0001))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_large_volume_customers_aggregates_before_joins(spark, sf0001):
    from linkgraph.entry_queries import q_large_volume_customers

    plan = _plan(q_large_volume_customers(spark, sf0001))
    # qty rollup + HAVING filter sit UPSTREAM of the orders/customer
    # joins; downstream-first tree print => joins appear earlier
    first_join = min(
        i
        for i in (
            plan.find("SortMergeJoin"),
            plan.find("BroadcastHashJoin"),
            plan.find("ShuffledHashJoin"),
        )
        if i >= 0
    )
    assert first_join < plan.index("HashAggregate")
