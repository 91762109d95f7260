"""Directed triad census vs a from-scratch brute-force classifier on
random directed graphs (every triple enumerated and permutation-matched
— independent of the operator's tricode/wedge algebra)."""

import itertools
import random

import pytest

from linkgraph.algos.triads import TRIAD_CLASSES, _BIT, _EXEMPLARS, triad_census


def _brute(n, edges):
    eset = set(edges)
    exemplar_sets = {k: frozenset(v) for k, v in _EXEMPLARS.items()}
    counts = dict.fromkeys(TRIAD_CLASSES, 0)
    for tri in itertools.combinations(range(n), 3):
        sub = {
            (i, j)
            for i, j in itertools.permutations(range(3), 2)
            if (tri[i], tri[j]) in eset
        }
        for name, ex in exemplar_sets.items():
            if any(
                {(p[i], p[j]) for i, j in sub} == ex
                for p in itertools.permutations(range(3))
            ):
                counts[name] += 1
                break
        else:  # pragma: no cover
            raise AssertionError(f"unclassified {sub}")
    return counts


def test_tricode_lut_complete():
    from linkgraph.algos.triads import TRICODE_CLASS

    assert len(TRICODE_CLASS) == 64
    assert set(TRICODE_CLASS) == set(TRIAD_CLASSES)
    assert TRICODE_CLASS[0] == "003" and TRICODE_CLASS[63] == "300"


@pytest.mark.parametrize("seed,p", [(1, 0.15), (2, 0.3), (3, 0.5)])
def test_census_matches_brute_force(spark, seed, p):
    rng = random.Random(seed)
    n = 14
    edges = [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and rng.random() < p
    ]
    exp = _brute(n, edges)
    # isolated vertices are invisible to an edge-list operator: restrict
    # the brute count to the touched vertex set
    touched = sorted({v for e in edges for v in e})
    remap = {v: i for i, v in enumerate(touched)}
    exp = _brute(len(touched), [(remap[a], remap[b]) for a, b in edges])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["klass"]: r["cnt"] for r in triad_census(df).collect()}
    assert got == exp
    assert sum(got.values()) == len(touched) * (len(touched) - 1) * (len(touched) - 2) // 6
