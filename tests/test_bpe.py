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
