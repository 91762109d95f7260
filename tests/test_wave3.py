"""transition_latency / local_bridges / clustering_by_degree /
fertility_by_lang vs exact hand-computed oracles."""

import collections
import re
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

EVENTS = []  # (event_id, ts, user_id, event_type)
_t0 = datetime(2026, 1, 1)
for i, (u, et, dt_s) in enumerate(
    [
        (1, "a", 0),
        (1, "b", 10),   # a->b gap 10
        (1, "a", 70),   # b->a gap 60
        (1, "c", 100),  # a->c gap 30
        (2, "a", 0),    # single-event user: no transition
        (3, "b", 5),
        (3, "b", 6),    # b->b gap 1
        (3, "a", 300),  # b->a gap 294
    ]
):
    EVENTS.append((i, _t0 + timedelta(seconds=dt_s), u, et))


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_transition_latency_exact(events):
    from linkgraph.operators.events import transition_latency

    got = {
        (r.src_type, r.dst_type): (r.n, r.mean_gap_s, r.max_gap_s)
        for r in transition_latency(events).collect()
    }
    by_user = collections.defaultdict(list)
    for _, ts, u, et in EVENTS:
        by_user[u].append((int(ts.timestamp()), et))
    gaps = collections.defaultdict(list)
    for rows in by_user.values():
        rows.sort()
        for (e0, t0), (e1, t1) in zip(rows, rows[1:]):
            gaps[(t0, t1)].append(e1 - e0)
    want = {
        k: (len(v), round(sum(v) / len(v), 6), max(v)) for k, v in gaps.items()
    }
    assert got == want
    # single-event user 2 contributes no transition anywhere
    assert sum(n for n, _, _ in got.values()) == 5


# bowtie: two triangles 1-2-3 and 4-5-6 joined by the bridge 3-4, plus a
# pendant 6-7.  Local bridges = edges with no common neighbor: (3,4), (6,7).
BOWTIE = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7)]


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_local_bridges_bowtie(spark):
    from linkgraph.algos.triangles import local_bridges

    g = LinkGraph(
        spark.createDataFrame(_sym(BOWTIE), "src long, dst long"),
        materialize=False,
    )
    rows = {(r.src, r.dst): (r.src_deg, r.dst_deg) for r in local_bridges(g).collect()}
    assert set(rows) == {(3, 4), (6, 7)}
    # degrees in the symmetric bowtie: deg(3)=3 (1,2,4), deg(4)=3 (3,5,6),
    # deg(6)=3 (4,5,7), deg(7)=1
    assert rows[(3, 4)] == (3, 3)
    assert rows[(6, 7)] == (3, 1)


def test_local_bridges_none_on_triangle(spark):
    from linkgraph.algos.triangles import local_bridges

    g = LinkGraph(
        spark.createDataFrame(_sym([(1, 2), (2, 3), (1, 3)]), "src long, dst long"),
        materialize=False,
    )
    assert local_bridges(g).count() == 0


def test_clustering_by_degree_matches_per_vertex_mean(spark):
    from linkgraph.algos.gstats import clustering_by_degree
    from linkgraph.algos.triangles import clustering_coefficients

    g = LinkGraph(
        spark.createDataFrame(_sym(BOWTIE), "src long, dst long"),
        materialize=False,
    )
    got = {
        r.deg: (r.n_vertices, r.mean_lcc)
        for r in clustering_by_degree(g).collect()
    }
    cc = clustering_coefficients(g).where(F.col("deg") >= 2).collect()
    per_deg = collections.defaultdict(list)
    for r in cc:
        per_deg[r.deg].append(2.0 * r.tri / (r.deg * (r.deg - 1)))
    want = {
        d: (len(v), round(sum(v) / len(v), 6)) for d, v in per_deg.items()
    }
    assert got == want
    # deg-1 pendant (vertex 7) must be excluded
    assert 1 not in got


DOCS = [
    (1, "Hello world, 42 times!", "en"),
    (2, "  spaced   out   text  ", "en"),
    (3, "abc123", "xx"),
    (4, "", "xx"),
]


def test_fertility_by_lang_exact(spark):
    from linkgraph.textops.textstats import fertility_by_lang

    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {
        r.lang: (r.n_docs, r.n_words, r.n_bpe_tokens, r.fertility, r.chars_per_token)
        for r in fertility_by_lang(docs).collect()
    }
    bpe_re = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]+")
    want = {}
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for _, text, lang in DOCS:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text.strip().split()) if text.strip() else 0
        a[2] += len(bpe_re.findall(text.lower()))
        a[3] += len(text)
    for lang, (nd, nw, nb, nc) in agg.items():
        want[lang] = (nd, nw, nb, round(nb / nw, 6), round(nc / nb, 6))
    assert got == want


def test_attack_robustness_bowtie(spark):
    from linkgraph.algos.components import attack_robustness

    g = LinkGraph(
        spark.createDataFrame(_sym(BOWTIE), "src long, dst long"),
        materialize=False,
    )
    got = {
        r.n_removed: (r.n_vertices, r.n_components, r.giant_size)
        for r in attack_robustness(g, [0, 1]).collect()
    }
    # k=0: the bowtie is one 7-vertex component.
    assert got[0] == (7, 1, 7)
    # k=1 removes vid=3 (deg 3, lowest vid among the deg-3 tie): the
    # residual edges are {1,2} and the right triangle + pendant.
    assert got[1] == (6, 2, 4)


def test_failure_robustness_bowtie_hash_order(spark):
    import hashlib

    from linkgraph.algos.components import attack_robustness

    g = LinkGraph(
        spark.createDataFrame(_sym(BOWTIE), "src long, dst long"),
        materialize=False,
    )
    got = {
        r.n_removed: (r.n_vertices, r.n_components, r.giant_size)
        for r in attack_robustness(g, [1], by="hash").collect()
    }
    # independent recomputation of the portable-hash argmin:
    h = lambda v: int(hashlib.md5(f"{v}#fail".encode()).hexdigest()[:15], 16)
    assert min(range(1, 8), key=lambda v: (h(v), v)) == 6
    # removing vid=6 isolates the pendant 7 (drops out) and leaves the
    # left triangle chained to {4,5}: one 5-vertex component.
    assert got[1] == (5, 1, 5)
