"""textops/bpe.py vs hand-computed merge sequences."""


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_merges_hand_computed_with_tie_break(spark):
    from linkgraph.textops.bpe import bpe_merge_table

    # 'aaab' x3: iter1 (a,a)=6 beats (a,b)=3; iter2 ties (aa,a)=3 vs
    # (a,b)=3 -> lexicographic 'a b' wins; iter3 merges the rest; iter4
    # has no pairs left -> only 3 rules come back.
    out = bpe_merge_table(_docs(spark, ["aaab aaab", "aaab"]), num_merges=4)
    rows = [(r.merge_rank, r.pair, r.merged, r.cnt) for r in out.collect()]
    assert sorted(rows) == [
        (1, "a a", "aa", 6),
        (2, "a b", "ab", 3),
        (3, "aa ab", "aaab", 3),
    ]


def test_bpe_nonoverlapping_greedy_is_deterministic(spark):
    from linkgraph.textops.bpe import bpe_merge_table

    # 'ababab': replace-greedy merges the 1st and 3rd (a,b) occurrence,
    # the middle one survives to round 2 (documented engine-identical
    # deviation from reference BPE on >=3 back-to-back repeats)
    out = bpe_merge_table(_docs(spark, ["ababab"]), num_merges=2)
    rows = sorted((r.merge_rank, r.pair, r.cnt) for r in out.collect())
    assert rows == [(1, "a b", 3), (2, "a b", 1)]


def test_bpe_fertility_curve_hand_computed(spark):
    from linkgraph.textops.bpe import bpe_fertility_curve

    # 'aaab' x3: step0 vocab {a,b}=2, total=4*3=12, spw=4.0
    # merge1 (a,a): 'aa a b' -> vocab {aa,a,b}=3, total=9, spw=3.0
    # merge2 (a,b): 'aa ab'  -> vocab {aa,ab}=2, total=6, spw=2.0
    # merge3 (aa,ab): 'aaab' -> vocab {aaab}=1, total=3, spw=1.0
    out = bpe_fertility_curve(_docs(spark, ["aaab aaab", "aaab"]), num_merges=4)
    rows = sorted(
        (r.step, r.vocab_symbols, r.total_symbols, r.symbols_per_word)
        for r in out.collect()
    )
    assert rows == [
        (0, 2, 12, 4.0),
        (1, 3, 9, 3.0),
        (2, 2, 6, 2.0),
        (3, 1, 3, 1.0),
    ]


def test_benford_audit_uniform_digits(spark):
    import math

    import pytest as _pt

    from linkgraph.operators.profile import benford_audit

    # 9 events valued 1.00..9.00: each digit observed once, share 1/9
    rows = [(i, None, 1, "x", float(d)) for i, d in enumerate(range(1, 10))]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.digit: r for r in benford_audit(df).collect()}
    assert set(got) == set(range(1, 10))
    chi2 = sum(
        (1 - 9 * math.log10(1 + 1 / d)) ** 2 / (9 * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    for d in range(1, 10):
        assert got[d].n_d == 1
        assert got[d].share == _pt.approx(1 / 9, abs=1e-6)
        assert got[d].benford_p == _pt.approx(math.log10(1 + 1 / d), abs=1e-6)
        assert got[d].chi2 == _pt.approx(chi2, abs=1e-5)


def test_population_stability_terms_and_epsilon(spark):
    import math

    import pytest as _pt

    from linkgraph.operators.profile import population_stability

    # A: 8 ref / 2 cur, B: 2 ref / 8 cur, C: cur-only (epsilon clamp)
    rows = (
        [("ref", "A")] * 8 + [("cur", "A")] * 2
        + [("ref", "B")] * 2 + [("cur", "B")] * 8
        + [("cur", "C")] * 5
    )
    df = spark.createDataFrame(rows, "pop string, cat string")
    got = {r.cat: r for r in population_stability(df).collect()}

    def term(pr, pc):
        pr, pc = max(pr, 1e-6), max(pc, 1e-6)
        return (pc - pr) * math.log(pc / pr)

    assert got["A"].n_ref == 8 and got["A"].n_cur == 2
    assert got["A"].psi_term == _pt.approx(term(8 / 10, 2 / 15), abs=1e-6)
    assert got["B"].psi_term == _pt.approx(term(2 / 10, 8 / 15), abs=1e-6)
    # C has zero ref mass -> share clamped at 1e-6, term stays finite
    assert got["C"].n_ref == 0
    assert got["C"].psi_term == _pt.approx(term(0.0, 5 / 15), abs=1e-6)
    assert math.isfinite(got["C"].psi_term)


def test_grouped_ols_exact_line_and_degenerate(spark):
    import pytest as _pt

    from linkgraph.operators.profile import grouped_ols

    rows = [("L", float(x), 2.0 * x + 1.0) for x in range(1, 6)]
    rows += [("D", 3.0, float(y)) for y in range(1, 4)]  # zero x-variance
    rows += [("N", 1.0, 5.0), ("N", 2.0, None)]  # null y dropped -> n=1
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.grp: r for r in grouped_ols(df, "g", "x", "y").collect()}
    assert got["L"].n == 5
    assert got["L"].slope == _pt.approx(2.0, abs=1e-6)
    assert got["L"].intercept == _pt.approx(1.0, abs=1e-6)
    assert got["L"].r2 == _pt.approx(1.0, abs=1e-6)
    assert got["D"].slope is None and got["D"].r2 is None
    assert got["N"].n == 1 and got["N"].slope is None


def test_classifier_report_hand_matrix(spark):
    import pytest as _pt

    from linkgraph.operators.profile import classifier_report

    # truth: 4 a, 3 b, 1 c; preds: a->a x3, a->b x1, b->b x2, b->a x1,
    # c->d x1 (class c never predicted, class d never true)
    rows = (
        [("a", "a")] * 3 + [("a", "b")]
        + [("b", "b")] * 2 + [("b", "a")]
        + [("c", "d")]
    )
    df = spark.createDataFrame(rows, "truth string, pred string")
    got = {r.label: r for r in classifier_report(df).collect()}
    assert got["a"].n_true == 4 and got["a"].n_pred == 4 and got["a"].tp == 3
    assert got["a"].precision == _pt.approx(0.75)
    assert got["a"].recall == _pt.approx(0.75)
    assert got["a"].f1 == _pt.approx(0.75)
    assert got["b"].precision == _pt.approx(2 / 3, abs=1e-6)
    assert got["b"].recall == _pt.approx(2 / 3, abs=1e-6)
    # c: never predicted -> precision NULL, recall 0, f1 NULL
    assert got["c"].precision is None and got["c"].recall == 0.0
    assert got["c"].f1 is None
    # d: never true -> recall NULL, precision 0
    assert got["d"].recall is None and got["d"].precision == 0.0
