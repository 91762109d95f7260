"""Round-5 widening wave vs exact pure-Python oracles: Luby MIS,
community modularity, cross-split contamination audit, Gopher-style
repetition stats."""

import collections
import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.algos.gstats import community_modularity
from linkgraph.algos.mis import maximal_independent_set
from linkgraph.fixtures import edges_df, er_edges, two_cliques_edges
from linkgraph.graph import LinkGraph
from linkgraph.textops.dedup import contamination_check
from linkgraph.textops.textstats import repetition_stats

PAIRS = er_edges(150, 0.04, seed=11)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _adj(pairs):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=8)


def _python_luby(pairs, max_rounds=64):
    """Reference Luby with the same md5 round-priority."""
    adj = _adj(pairs)
    und = set(adj)
    out = {}
    for r in range(1, max_rounds + 1):
        if not und:
            break
        prio = {v: _h60(f"{r}:{v}") for v in und}
        winners = {
            v
            for v in und
            if all(prio[v] < prio[u] for u in adj[v] if u in und)
        }
        for v in winners:
            out[v] = r
        removed = set(winners)
        for v in winners:
            removed |= adj[v] & und
        und -= removed
    return out, und


def test_mis_matches_python_oracle(er):
    exp, leftover = _python_luby(PAIRS)
    assert not leftover  # ER at this density drains well within 64 rounds
    got = {
        r["vid"]: r["joined_round"]
        for r in maximal_independent_set(er).collect()
    }
    assert got == exp


def test_mis_independent_and_maximal(er):
    adj = _adj(PAIRS)
    mis = {r["vid"] for r in maximal_independent_set(er).collect()}
    for v in mis:
        assert not (adj[v] & mis), f"adjacent MIS members at {v}"
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, f"non-member {v} has no MIS neighbor"


def test_mis_fixed_round_budget_is_prefix(er):
    full = {
        r["vid"]: r["joined_round"]
        for r in maximal_independent_set(er).collect()
    }
    two = {
        r["vid"]: r["joined_round"]
        for r in maximal_independent_set(er, rounds=2).collect()
    }
    assert two == {v: rd for v, rd in full.items() if rd <= 2}


def test_mis_requires_symmetric(spark):
    from linkgraph.schemas import EDGES

    g = LinkGraph(
        spark.createDataFrame(pd.DataFrame([(0, 1)], columns=["src", "dst"]), EDGES),
        symmetric=False,
    )
    with pytest.raises(ValueError, match="symmetric"):
        maximal_independent_set(g)


def test_community_modularity_two_cliques(spark):
    k = 8
    g = LinkGraph.from_undirected(edges_df(spark, two_cliques_edges(k)), num_partitions=4)
    lab = spark.createDataFrame(
        pd.DataFrame(
            [(v, 0 if v < k else 1) for v in range(2 * k)], columns=["vid", "label"]
        )
    )
    rows = {r["label"]: r for r in community_modularity(g, lab).collect()}
    # directed M = 2 * (2*C(k,2) + 1); internal per clique = 2*C(k,2)
    m = 2 * (k * (k - 1) + 1)
    internal = k * (k - 1)
    dsum0 = internal + 1  # vertex 0 carries the bridge
    for lbl in (0, 1):
        r = rows[lbl]
        assert r["n_vertices"] == k
        assert r["internal_edges"] == internal
        assert r["degree_sum"] == dsum0
        assert r["q_contrib"] == pytest.approx(
            internal / m - (dsum0 / m) ** 2, abs=1e-6
        )
    q = sum(r["q_contrib"] for r in rows.values())
    assert 0.4 < q < 0.5  # near-perfect split of two cliques


def test_contamination_planted(spark):
    # pick ids on each side of the md5 split deterministically
    def is_train(i):
        return _h60(f"{i}#split") % 10_000 < 8_000

    train_id = next(i for i in range(100) if is_train(i))
    eval_dup = next(i for i in range(100) if not is_train(i))
    eval_new = next(i for i in range(eval_dup + 1, 200) if not is_train(i))
    eval_half = next(i for i in range(eval_new + 1, 300) if not is_train(i))
    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens -> 4 5-grams
    novel = "one two three four five six seven eight"
    half = "alpha beta gamma delta epsilon nine ten eleven"  # shares 1 of 4 5-grams
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (train_id, base),
                (eval_dup, base),
                (eval_new, novel),
                (eval_half, half),
            ],
            columns=["doc_id", "text"],
        )
    )
    rows = {r["doc_id"]: r for r in contamination_check(docs, n=5).collect()}
    assert set(rows) == {eval_dup, eval_new, eval_half}
    assert rows[eval_dup]["n_shingles"] == 4
    assert rows[eval_dup]["contamination_ratio"] == pytest.approx(1.0)
    assert rows[eval_new]["contamination_ratio"] == pytest.approx(0.0)
    assert rows[eval_half]["n_hit"] == 1
    assert rows[eval_half]["contamination_ratio"] == pytest.approx(0.25)


def test_contamination_short_doc_zero(spark):
    def is_train(i):
        return _h60(f"{i}#split") % 10_000 < 8_000

    ev = next(i for i in range(100) if not is_train(i))
    docs = spark.createDataFrame(
        pd.DataFrame([(ev, "too short")], columns=["doc_id", "text"])
    )
    r = contamination_check(docs, n=5).collect()
    assert len(r) == 1
    assert r[0]["n_shingles"] == 0 and r[0]["contamination_ratio"] == 0.0


def test_repetition_stats_known_doc(spark):
    text = "\n".join(
        [
            "the cat sat",  # repeated line (x2) -> dup ratio 2 dup of 5
            "the cat sat",
            "- bullet one",
            "unique line here",
            "trailing off...",
        ]
    )
    docs = spark.createDataFrame(pd.DataFrame([(1, text)], columns=["doc_id", "text"]))
    r = repetition_stats(docs).collect()[0]
    assert r["n_lines"] == 5
    assert r["dup_line_ratio"] == pytest.approx(1 / 5)  # 5 lines, 4 distinct
    # tokens: the cat sat the cat sat bullet one unique line here trailing off
    # bigrams: 12 total, mode "the cat"/"cat sat" x2 -> 2/12
    assert r["top_bigram_ratio"] == pytest.approx(round(2 / 12, 4))
    assert r["bullet_line_ratio"] == pytest.approx(1 / 5)
    assert r["ellipsis_line_ratio"] == pytest.approx(1 / 5)
    assert not r["flagged"]


def test_repetition_stats_flags_degenerate(spark):
    spammy = "\n".join(["buy now click here"] * 20)
    clean = "a perfectly normal sentence with varied words in it"
    docs = spark.createDataFrame(
        pd.DataFrame([(1, spammy), (2, clean), (3, "")], columns=["doc_id", "text"])
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["flagged"]
    assert rows[1]["dup_line_ratio"] == pytest.approx(19 / 20)
    assert not rows[2]["flagged"]
    assert rows[3]["n_lines"] == 0 and not rows[3]["flagged"]


def test_repetition_stats_zero_shuffle(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([(1, "a b c")], columns=["doc_id", "text"])
    )
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_scrub_planted(spark):
    from linkgraph.textops.pii import pii_scrub

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "mail me at jane.doe+x@corp.example.org today"),
                (2, "server 192.168.1.254 and backup 10.0.0.1 are up"),
                (3, "call +1 (555) 010-9999 or 555-0100 x2"),
                (4, "no pii here at all"),
                (5, "a@b.io pinged 8.8.8.8 from +44 20 7946 0958"),
            ],
            columns=["doc_id", "text"],
        )
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_pii"] == 1
    assert "<EMAIL>" in rows[1]["clean_text"]
    assert "jane" not in rows[1]["clean_text"]
    assert rows[2]["n_ipv4"] == 2
    assert rows[2]["clean_text"] == "server <IP> and backup <IP> are up"
    assert rows[3]["n_phones"] >= 1 and "<PHONE>" in rows[3]["clean_text"]
    assert "555" not in rows[3]["clean_text"].replace("x2", "")
    assert rows[4]["n_pii"] == 0 and rows[4]["clean_text"] == "no pii here at all"
    assert rows[5]["n_emails"] == 1 and rows[5]["n_ipv4"] == 1
    assert rows[5]["n_phones"] == 1 and rows[5]["n_pii"] == 3


def test_pii_scrub_email_digits_not_double_counted(spark):
    from linkgraph.textops.pii import pii_scrub

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "user12345678@host.com")], columns=["doc_id", "text"])
    )
    r = pii_scrub(docs).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 0 and r["n_ipv4"] == 0


def test_pii_scrub_zero_shuffle(spark):
    from linkgraph.textops.pii import pii_scrub

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "x")], columns=["doc_id", "text"])
    )
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _python_jp(pairs, max_rounds=256):
    """Reference Jones-Plassmann with the same fixed md5 priority."""
    adj = _adj(pairs)
    prio = {v: _h60(f"c:{v}") for v in adj}
    used = {v: 0 for v in adj}
    color = {}
    rounds = {}
    unc = set(adj)
    for r in range(1, max_rounds + 1):
        if not unc:
            break
        winners = {
            v for v in unc if all(prio[v] < prio[u] for u in adj[v] if u in unc)
        }
        for v in winners:
            c = 0
            while used[v] >> c & 1:
                c += 1
            color[v] = c
            rounds[v] = r
        for v in winners:
            for u in adj[v]:
                if u in unc and u not in winners:
                    used[u] |= 1 << color[v]
        unc -= winners
    return color, rounds, unc


def test_coloring_matches_python_oracle(er):
    from linkgraph.algos.coloring import greedy_coloring

    exp_c, exp_r, leftover = _python_jp(PAIRS)
    assert not leftover
    rows = greedy_coloring(er).collect()
    got_c = {r["vid"]: r["color"] for r in rows}
    got_r = {r["vid"]: r["colored_round"] for r in rows}
    assert got_c == exp_c
    assert got_r == exp_r


def test_coloring_is_proper_and_bounded(er):
    from linkgraph.algos.coloring import greedy_coloring

    adj = _adj(PAIRS)
    c = {r["vid"]: r["color"] for r in greedy_coloring(er).collect()}
    assert set(c) == set(adj)  # every vertex colored
    for v, ns in adj.items():
        for u in ns:
            assert c[v] != c[u], f"conflict on edge ({v},{u})"
    max_deg = max(len(ns) for ns in adj.values())
    assert max(c.values()) <= max_deg  # greedy <= Delta+1 colors (0-based)


def test_coloring_fixed_rounds_is_prefix(er):
    from linkgraph.algos.coloring import greedy_coloring

    full = {
        (r["vid"], r["color"], r["colored_round"])
        for r in greedy_coloring(er).collect()
    }
    three = {
        (r["vid"], r["color"], r["colored_round"])
        for r in greedy_coloring(er, rounds=3).collect()
    }
    assert three == {t for t in full if t[2] <= 3}


def _events_df(spark, rows):
    """rows: (event_id, epoch_sec, user_id, event_type)"""
    pdf = pd.DataFrame(rows, columns=["event_id", "e", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["e"], unit="s")
    return spark.createDataFrame(pdf[["event_id", "ts", "user_id", "event_type"]])


def test_temporal_contact_edges_match_bruteforce(spark):
    from linkgraph.operators.temporal import temporal_contact_edges

    import itertools
    import random

    rng = random.Random(3)
    rows = [
        (i, 1_700_000_000 + rng.randrange(0, 7200), rng.randrange(0, 12),
         rng.choice("abc"))
        for i in range(120)
    ]
    w = 600
    exp = set()
    for r1, r2 in itertools.combinations(rows, 2):
        if r1[3] == r2[3] and r1[2] != r2[2] and abs(r1[1] - r2[1]) <= w:
            a, b2 = sorted((r1[2], r2[2]))
            t = max(r1[1], r2[1])
            exp.add((a, b2, t))
            exp.add((b2, a, t))
    got = {
        (r["src"], r["dst"], r["t"])
        for r in temporal_contact_edges(_events_df(spark, rows), window_s=w).collect()
    }
    assert got == exp


def test_earliest_arrival_chain_and_antichain(spark):
    from linkgraph.operators.temporal import earliest_arrival

    # contacts: 1-2 @ t=100, 2-3 @ t=200 (chain works forward),
    # 4-5 @ t=500, 5-6 @ t=400 (static path 4->6 exists, temporal does NOT)
    pairs = [(1, 2, 100), (2, 3, 200), (4, 5, 500), (5, 6, 400)]
    pdf = pd.DataFrame(
        pairs + [(b, a, t) for a, b, t in pairs], columns=["src", "dst", "t"]
    )
    te = spark.createDataFrame(pdf)
    srcs = spark.createDataFrame(pd.DataFrame({"vid": [1, 4]}))
    got = {r["vid"]: r["arrival"] for r in earliest_arrival(te, srcs).collect()}
    assert got == {1: -1, 2: 100, 3: 200, 4: -1, 5: 500}
    assert 6 not in got  # temporally unreachable despite static path


def test_earliest_arrival_python_oracle(spark):
    from linkgraph.operators.temporal import earliest_arrival, temporal_contact_edges

    import random

    rng = random.Random(9)
    rows = [
        (i, 1_700_000_000 + rng.randrange(0, 3600), rng.randrange(0, 20),
         rng.choice("ab"))
        for i in range(150)
    ]
    ev = _events_df(spark, rows)
    te = temporal_contact_edges(ev, window_s=300)
    edges = [(r["src"], r["dst"], r["t"]) for r in te.collect()]
    sources = sorted({u for _, _, u, _ in rows if u % 5 == 0})
    srcs = spark.createDataFrame(pd.DataFrame({"vid": sources}))

    # python fixpoint
    arr = {v: -1 for v in sources}
    changed = True
    while changed:
        changed = False
        for s, d, t in edges:
            if s in arr and t >= arr[s] and (d not in arr or t < arr[d]):
                arr[d] = t
                changed = True
    got = {r["vid"]: r["arrival"] for r in earliest_arrival(te, srcs, rounds=64).collect()}
    assert got == arr


def test_ngram_topk_exact(spark):
    from linkgraph.textops.collocations import ngram_topk

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "a b c a b c a b"),
                (2, "a b x"),
                (3, "z"),  # too short for trigram
            ],
            columns=["doc_id", "text"],
        )
    )
    rows = [(r["gram"], r["cnt"]) for r in ngram_topk(docs, n=3, k=3).collect()]
    # doc1 trigrams: "a b c","b c a","c a b","a b c","b c a","c a b" -> 2 each
    # doc2: "a b x" -> 1;  ties break lexicographically
    assert rows == [("a b c", 2), ("b c a", 2), ("c a b", 2)]


def test_pmi_collocations_known_corpus(spark):
    import math

    from linkgraph.textops.collocations import pmi_collocations

    # "hong kong" always together (perfect collocation); "the the" frequent
    # but independent-ish
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "hong kong the cat the dog"),
                (2, "hong kong the fish the bird"),
                (3, "hong kong the sun the moon"),
            ],
            columns=["doc_id", "text"],
        )
    )
    rows = pmi_collocations(docs, k=5, min_count=3).collect()
    top = rows[0]
    assert (top["w1"], top["w2"]) == ("hong", "kong")
    # exact: T=18 tokens, B=15 bigrams, n_pair=3, n_hong=n_kong=3
    exp = math.log((3 / 15) / ((3 / 18) * (3 / 18)))
    assert top["pmi"] == pytest.approx(round(exp, 6), abs=2e-6)
    assert top["n_pair"] == 3


def test_pmi_min_count_filters(spark):
    from linkgraph.textops.collocations import pmi_collocations

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "p q p q r s")], columns=["doc_id", "text"])
    )
    got = {(r["w1"], r["w2"]) for r in pmi_collocations(docs, k=10, min_count=2).collect()}
    assert got == {("p", "q")}  # "q p","q r","r s" occur once -> dropped
