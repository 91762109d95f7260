"""shared_ngram_spans vs an exact pure-Python span oracle."""

import re

import pytest

from linkgraph.textops.dedup import shared_ngram_spans

TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "zero alpha beta gamma one two",          # shares spans of 0
    "alpha beta gamma delta nine ten",        # shares longer run with 0
    "unrelated words entirely here now",
    "beta gamma delta epsilon tail",          # shares with 0 and 2
    "xx",                                     # shorter than k
    "boiler plate line boiler plate line boiler plate line",  # internal repeat only
]


def _grams(text, k):
    ts = re.findall("[a-z0-9]+", text.lower())
    return {" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)}


def _oracle(k=3, df_cap=100, min_spans=1):
    gs = [_grams(t, k) for t in TEXTS]
    df = {}
    for g in gs:
        for x in g:
            df[x] = df.get(x, 0) + 1
    keep = {x for x, d in df.items() if 2 <= d <= df_cap}
    want = {}
    for a in range(len(TEXTS)):
        for b in range(a + 1, len(TEXTS)):
            n = len(gs[a] & gs[b] & keep)
            if n >= min_spans:
                want[(a, b)] = n
    return want


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_shared_ngram_spans_vs_bruteforce(docs):
    got = {
        (r.a, r.b): r.n_spans
        for r in shared_ngram_spans(docs, k=3, df_cap=100).collect()
    }
    assert got == _oracle(k=3, df_cap=100)
    assert got, "fixture must produce shared spans"


def test_shared_ngram_spans_df_cap(docs):
    # cap=2 drops every gram present in 3+ docs ("beta gamma delta" etc.)
    got = {
        (r.a, r.b): r.n_spans
        for r in shared_ngram_spans(docs, k=3, df_cap=2).collect()
    }
    want = _oracle(k=3, df_cap=2)
    assert got == want
    assert got != _oracle(k=3, df_cap=100), "cap must be non-vacuous here"


def test_shared_ngram_spans_short_docs_and_self_repeats(docs):
    got = shared_ngram_spans(docs, k=3, df_cap=100).collect()
    ids = {r.a for r in got} | {r.b for r in got}
    assert 5 not in ids  # shorter than k: no spans
    assert 6 not in ids  # internal repetition alone creates no pair


def test_containment_pairs_subset_doc(spark):
    from linkgraph.textops.dedup import containment_pairs

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",  # superset
        "beta gamma delta",                               # fully contained in 0
        "unrelated words only here",
        "alpha beta unrelated",                           # partial overlap
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.a, r.b): r.containment
        for r in containment_pairs(docs, threshold=0.0).collect()
    }
    # doc 1 fully inside doc 0; reverse direction is 3/8
    assert got[(1, 0)] == 1.0
    assert got[(0, 1)] == round(3 / 8, 6)
    assert got[(3, 0)] == round(2 / 3, 6)
    assert (2, 0) not in got
    high = {
        (r.a, r.b)
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert high == {(1, 0)}


def test_split_leakage_detects_cross_split_pair(spark):
    import hashlib

    from linkgraph.textops.dedup import split_leakage

    def split_of(i, weights=(("train", 0.8), ("val", 0.1), ("test", 0.1))):
        h = hashlib.md5(f"{i}#split".encode()).hexdigest()
        bkt = int(h[:15], 16) % 10000
        acc = 0
        for name, w in weights[:-1]:
            acc += int(round(w * 10000))
            if bkt < acc:
                return name
        return weights[-1][0]

    # find a (train, test) id pair and a (train, train) id pair
    ids = list(range(200))
    train_ids = [i for i in ids if split_of(i) == "train"]
    test_ids = [i for i in ids if split_of(i) == "test"]
    assert train_ids and test_ids
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    other = "completely different text about cooking pasta with olive oil basil"
    rows = [
        (train_ids[0], base),
        (test_ids[0], near),        # cross-split near-dup -> leak
        (train_ids[1], base + " x"),  # near-dup of BOTH 0 (in-split,
                                      # not a leak) and 1 (second leak)
        (train_ids[2], other),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.split_a, r.split_b): r.n_pairs
        for r in split_leakage(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, threshold=0.5
        ).collect()
    }
    assert got.get(("test", "train")) == 2
    assert sum(got.values()) == 2  # the in-split (train,train) pair is
    # not counted: 3 near-dup pairs exist, only the 2 crossing count


def test_ngram_novelty_exact(spark):
    import re

    from linkgraph.textops.dedup import TOKEN_RE
    from linkgraph.textops.textstats import ngram_novelty

    texts = [
        "alpha beta gamma delta epsilon",     # shares a prefix with 1
        "alpha beta gamma nine ten eleven",
        "completely original words here today now",
        "xx yy",                              # shorter than k: absent
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def grams(t, k=3):
        ts = re.findall(TOKEN_RE, t.lower())
        return {" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)}

    gs = [grams(t) for t in texts]
    df = {}
    for g in gs:
        for x in g:
            df[x] = df.get(x, 0) + 1
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in ngram_novelty(docs, k=3).collect()
    }
    for i, g in enumerate(gs):
        if not g:
            assert i not in got
            continue
        novel = sum(1 for x in g if df[x] == 1)
        assert got[i] == (len(g), novel, round(novel / len(g), 6)), i
    assert got[2][2] == 1.0            # fully original
    assert got[0][2] < 1.0 and got[1][2] < 1.0  # shared "alpha beta gamma"
