"""Physical-plan guards for the third round-5 wave: promised perf
properties must be visible in the plan (sf0.001 driver fixtures)."""


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_psi_drift_single_rollup_totals_broadcast(spark, sf0001):
    from linkgraph.entry_queries import q_psi_drift

    plan = _plan(q_psi_drift(spark, sf0001))
    # one category rollup; the 1-row totals come back as a broadcast,
    # not a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan  # pure aggregate shape, no window at all


def test_retention_lift_windows_only_over_cells(spark, sf0001):
    from linkgraph.entry_queries import q_retention_lift

    plan = _plan(q_retention_lift(spark, sf0001))
    # the global-order windows must sit DOWNSTREAM of the bucket rollup
    # (≤n_buckets rows), never over the per-user table: formatted trees
    # print downstream-first, so every Window index precedes the last
    # HashAggregate index
    assert "Window" in plan
    assert plan.index("Window") < plan.rindex("HashAggregate")


def test_embedding_auc_cross_join_is_broadcast_nested_loop(spark, sf0001):
    from linkgraph.entry_queries import q_embedding_auc

    plan = _plan(q_embedding_auc(spark, sf0001))
    # the k x k AUC cartesian runs as a single-stage broadcast nested
    # loop, not a P^2-task CartesianProduct
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_ks_drift_cumulative_windows_are_partitioned(spark, sf0001):
    from linkgraph.entry_queries import q_ks_drift

    import re

    plan = _plan(q_ks_drift(spark, sf0001))
    # every cumulative/argmax window carries a partition spec (source or
    # length) — no empty-partition-spec window in any detail block (the
    # detail sections are "(n) Window\n...Arguments: [...]")
    blocks = re.findall(r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan)
    assert len(blocks) >= 2
    for args in blocks:
        assert ("source" in args) or ("l#" in args), args[:200]


def test_ipf_windows_run_over_cell_table(spark, sf0001):
    from linkgraph.entry_queries import q_ipf_weights

    plan = _plan(q_ipf_weights(spark, sf0001))
    # the corpus aggregate appears once; all IPF scaling windows sit
    # downstream of it (over the |I|x|J| cell table)
    assert plan.index("Window") < plan.rindex("HashAggregate")
