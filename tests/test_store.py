"""Cluster-safe edge-table materialization store (SURVEY.md S3):
the store root is configurable (conf/env), file:// URIs work end-to-end,
unpersist() removes the store through the Hadoop FS API (not shutil), and
non-local masters refuse the driver-tempdir default."""

import os

import pytest

from linkgraph.fixtures import edges_df, grid_edges
from linkgraph.graph import LinkGraph, edge_store_root


def test_store_file_uri_root_and_fs_cleanup(spark, tmp_path):
    root = f"file://{tmp_path}/edge_store"
    spark.conf.set("spark.linkgraph.store.root", root)
    try:
        # a derivation plan (Aggregate from .distinct) forces the round-trip
        pairs = edges_df(spark, grid_edges()).distinct()
        g = LinkGraph.from_undirected(pairs, num_partitions=4)
        assert g._store is not None and g._store.startswith(root)
        local = str(tmp_path / "edge_store")
        assert len(os.listdir(local)) == 1
        assert g.num_edges() == 2 * len(grid_edges())
        g.unpersist()
        # removed through the scheme-resolved FS, observable on local disk
        assert os.listdir(local) == []
        assert g._store is None
    finally:
        spark.conf.unset("spark.linkgraph.store.root")


def test_store_root_resolution_off_local_master():
    class _Conf:
        def __init__(self, d):
            self._d = d

        def get(self, k, default=None):
            return self._d.get(k, default)

    class _S:
        pass

    s = _S()
    s.conf = _Conf({"spark.master": "spark://host:7077"})
    saved = os.environ.pop("LINKGRAPH_STORE_ROOT", None)
    try:
        with pytest.raises(ValueError, match="shared-storage"):
            edge_store_root(s)
        os.environ["LINKGRAPH_STORE_ROOT"] = "s3a://bucket/store"
        assert edge_store_root(s) == "s3a://bucket/store"
        # session conf wins over the env
        s.conf = _Conf(
            {
                "spark.master": "spark://host:7077",
                "spark.linkgraph.store.root": "hdfs:///linkgraph",
            }
        )
        assert edge_store_root(s) == "hdfs:///linkgraph"
    finally:
        os.environ.pop("LINKGRAPH_STORE_ROOT", None)
        if saved is not None:
            os.environ["LINKGRAPH_STORE_ROOT"] = saved
