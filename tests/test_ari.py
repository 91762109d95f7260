"""Adjusted Rand Index: label-invariance, identity, refinement, and a
hand-computed contingency case."""

import pytest

from linkgraph.algos.gstats import clustering_agreement


def _df(spark, labels):
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(labels)], "vid long, label long"
    )


def _ari(spark, a, b):
    return clustering_agreement(_df(spark, a), _df(spark, b)).first()["ari"]


def test_ari_identity_and_label_invariance(spark):
    a = [0, 0, 1, 1, 2, 2]
    assert _ari(spark, a, a) == 1.0
    assert _ari(spark, a, [7, 7, 3, 3, 9, 9]) == 1.0  # renamed labels


def test_ari_hand_computed(spark):
    # X = {01}{23}, Y = {012}{3}: contingency [[2,0],[1,1]]
    # index=1, ax=2, ay=3+0=3... C(3,2)+C(1,2)=3; E=2*3/6=1, max=2.5
    # ARI = (1-1)/(2.5-1) = 0
    assert _ari(spark, [0, 0, 1, 1], [0, 0, 0, 1]) == 0.0


def test_ari_degenerate_trivial_partitions(spark):
    # both all-singletons: ax=ay=both=0, max==E -> convention 1.0
    assert _ari(spark, [0, 1, 2, 3], [3, 2, 1, 0]) == 1.0
