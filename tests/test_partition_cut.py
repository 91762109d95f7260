"""Partition cut report: on a path graph with sequential ids, range
partitioning cuts almost nothing while hash cuts ~(P-1)/P."""

from linkgraph.operators.skew import partition_cut_report


def test_range_beats_hash_on_sequential_path(spark):
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "src long, dst long"
    )
    rows = {r["partitioner"]: r for r in partition_cut_report(e, parts=8).collect()}
    assert rows["hash"]["n_edges"] == rows["range"]["n_edges"] == 1000
    # range: only the 7 boundary edges cross
    assert rows["range"]["cut_edges"] == 7
    # hash scatters uniformly: expected cut ~ 7/8
    assert rows["hash"]["cut_frac"] > 0.75
    assert 0.0 <= rows["range"]["cut_frac"] < rows["hash"]["cut_frac"]
