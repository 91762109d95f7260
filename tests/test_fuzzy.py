"""Blocked fuzzy matching vs a quadratic python Levenshtein reference."""

from pyspark.sql import functions as F

from linkgraph.textops.fuzzy import fuzzy_match_pairs

ROWS = [
    (0, "blue bolt"),
    (1, "blue belt"),     # dist 1 to 0
    (2, "blue melt"),     # dist 2 to 0, 1... same block "blue"
    (3, "blue widget"),   # far from all
    (4, "red bolt"),      # different block — never compared to blue *
    (5, "red bolts"),     # dist 1 to 4
    (6, "blue bolt"),     # exact dup of 0 — excluded by default
    (7, "bluebird x"),    # block "bluebird", alone
]


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _ref(max_dist, include_exact):
    lo = 0 if include_exact else 1
    out = {}
    for i, na in ROWS:
        for j, nb in ROWS:
            if i < j and na.split(" ")[0] == nb.split(" ")[0]:
                if abs(len(na) - len(nb)) <= max_dist:
                    d = _lev(na, nb)
                    if lo <= d <= max_dist:
                        out[(i, j)] = d
    return out


def _run(spark, max_dist, include_exact=False):
    df = spark.createDataFrame(ROWS, "id long, nm string")
    rows = fuzzy_match_pairs(
        df,
        id_col="id",
        name_col="nm",
        block=F.split(F.col("nm"), " ").getItem(0),
        max_dist=max_dist,
        include_exact=include_exact,
    ).collect()
    return {(r["a"], r["b"]): r["dist"] for r in rows}


def test_fuzzy_matches_python_reference(spark):
    for k in (1, 2, 3):
        assert _run(spark, k) == _ref(k, include_exact=False)


def test_fuzzy_include_exact_adds_distance_zero(spark):
    got = _run(spark, 2, include_exact=True)
    assert got == _ref(2, include_exact=True)
    assert got[(0, 6)] == 0


def test_fuzzy_blocking_prunes_cross_block(spark):
    # "blue bolt" vs "red bolt" is dist 3 but in different blocks
    got = _run(spark, 3)
    assert (0, 4) not in got and (4, 5) in got
