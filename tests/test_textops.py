"""Training-data ops: dedup (exact / MinHash-LSH / SimHash / Jaccard),
similarity search, text stats, fingerprints, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.textops.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    simhash,
    simhash_near_duplicates,
    word_jaccard_pairs,
)
from linkgraph.textops.simsearch import brute_force_knn, cosine_topk, lsh_knn
from linkgraph.textops.textstats import fingerprint, language_id, text_stats


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",  # near-dup of 0
        "completely different content about spark engines and shuffles",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "numerical linear algebra with distributed matrices",
        "zzz qqq xxx www",  # no overlap, non-english
    ]
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(base)), "text": base})
    ).cache()


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs).collect()
    dup = [g for g in groups if g["n_dups"] > 1]
    assert len(dup) == 1 and dup[0]["n_dups"] == 2 and dup[0]["keep_id"] == 0


def test_word_jaccard_finds_near_dup(docs):
    pairs = {(r["a"], r["b"]): r["jac"] for r in word_jaccard_pairs(docs, 0.5).collect()}
    assert pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7


def test_lsh_candidates_superset_of_true_pairs(docs):
    true = {(r["a"], r["b"]) for r in word_jaccard_pairs(docs, 0.7).collect()}
    cand = {(r["a"], r["b"]) for r in lsh_candidate_pairs(docs, 64, 32).collect()}
    assert true <= cand  # 32 bands of r=2: recall@0.7 ≈ 1-(1-.49)^32 ≈ 1
    verified = {(r["a"], r["b"]) for r in minhash_near_duplicates(docs, 0.7, 64, 32).collect()}
    assert verified == true


def test_portable_hash60_matches_hashlib(docs):
    """The md5 hash family (used by the DuckDB-oracle-checked queries) must
    equal int(md5_hex[:15], 16) — the cross-engine contract."""
    import hashlib

    from linkgraph.textops.dedup import portable_hash60

    got = {
        r["w"]: (r["h"], r["hs"])
        for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select(
            "w",
            portable_hash60("w").alias("h"),
            portable_hash60("w", seed=7).alias("hs"),
        )
        .collect()
    }
    assert got
    for w, (h, hs) in got.items():
        assert h == int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        assert hs == int(hashlib.md5(f"{w}#7".encode()).hexdigest()[:15], 16)


def test_simhash_portable_matches_reference(docs):
    """simhash_portable (pure JVM path) ≡ bit-majority reference in python."""
    import hashlib
    import re

    from linkgraph.textops.dedup import simhash_portable

    got = {r["doc_id"]: r["simhash"] for r in simhash_portable(docs).collect()}
    for row in docs.collect():
        ws = set(re.findall("[a-z0-9]+", row["text"].lower()))
        if not ws:
            assert row["doc_id"] not in got
            continue
        hs = [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in ws]
        v = 0
        for j in range(60):
            if 2 * sum((h >> j) & 1 for h in hs) > len(hs):
                v |= 1 << j
        assert got[row["doc_id"]] == v


def test_minhash_md5_family_equals_xxhash_family_pairs(docs):
    """Candidate generation is hash-family-invariant on this fixture (both
    families must bucket the exact dup pair together)."""
    # r = 64/32 = 2 rows per band: P[missing the jac≈0.8 near-dup] ≈ 1e-14
    md5_pairs = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(docs, 64, 32, hash_family="md5").collect()
    }
    assert (0, 3) in md5_pairs  # exact dup
    assert (0, 1) in md5_pairs  # near dup


def test_simhash_locality(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham01 = bin((sh[0] ^ sh[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
    ham02 = bin((sh[0] ^ sh[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert sh[0] == sh[3]  # identical docs → identical simhash
    assert ham01 < ham02  # near-dup closer than unrelated
    near = {(r["a"], r["b"]) for r in simhash_near_duplicates(docs, max_hamming=ham01).collect()}
    assert (0, 3) in near and (0, 1) in near


def test_fingerprint_deterministic(docs):
    a = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert a == b
    assert a[0] == a[3]  # identical text → identical fingerprint
    assert a[0] != a[2]


def test_language_id(docs):
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert lang[0] == "en" and lang[5] == "other"


def test_text_stats_shape(docs):
    df = text_stats(docs).toPandas().set_index("doc_id")
    assert (df["n_tokens"] > 0).all()
    assert df.loc[0, "n_tokens"] == 9
    assert 0 <= df["quality"].min() and df["quality"].max() <= 1.0


# ------------------------------------------------------------------ simsearch
@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[7] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near 0
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": range(60), "embedding": [v.tolist() for v in vecs]})
    ).cache()


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = V[0]
    sims = V @ q / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = sorted((-s, i) for i, s in enumerate(sims) if i != 0)[:10]
    exp = [i for _, i in order]
    got = [r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()]
    assert got == exp
    assert got[0] == 7


def test_brute_force_knn_multi_query(emb):
    qs = emb.where(F.col("vec_id") < 3)
    res = brute_force_knn(emb, qs, k=5).toPandas()
    assert set(res["query_id"]) == {0, 1, 2}
    assert (res.groupby("query_id").size() == 5).all()
    top0 = res[(res.query_id == 0) & (res["rank"] == 1)]["vec_id"].iloc[0]
    assert top0 == 7


def test_lsh_knn_finds_planted_neighbor(emb):
    got = [r["vec_id"] for r in lsh_knn(emb, 0, k=5, num_planes=8).collect()]
    assert got and got[0] == 7  # planted near-dup survives bucketing


# ----------------------------------------------------------------- multimodal
def test_multimodal_plumbing(spark):
    from linkgraph.textops.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        fake_feature,
        frame_sample_plan,
    )

    rows = [
        (1, "image", b"\x00\x01\x02\x03" * 10, "image/fake", 2, 2, None),
        (2, "video", b"\xff" * 64, "video/fake", 8, 8, 3000),
        (3, "audio", None, "audio/fake", None, None, 1500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, dim=8).toPandas().set_index("media_id")
    assert feats.loc[1, "n_bytes"] == 40
    assert len(feats.loc[1, "feature"]) == 8
    assert np.allclose(feats.loc[1, "feature"], fake_feature(rows[0][2], 8))
    assert feats.loc[3, "n_bytes"] == 0

    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    assert set(plan[plan.media_id == 2]["ts_ms"]) == {0, 1000, 2000, 3000}

    with pytest.raises(Exception):
        extract_features(media, use_real_decode=True).collect()


def test_lsh_knn_prebuilt_index_identical(emb):
    """Serving path: a precomputed+persisted bucket table gives identical
    results to the per-call demo path (round-2 weak #6)."""
    from linkgraph.textops.simsearch import build_lsh_index

    idx = build_lsh_index(emb, num_planes=8)
    assert (idx.num_planes, idx.dim) == (8, 16)  # self-describing metadata
    try:
        a = [(r["vec_id"], r["sim"]) for r in lsh_knn(emb, 0, k=5, num_planes=8).collect()]
        b = [
            (r["vec_id"], r["sim"])
            for r in lsh_knn(emb, 0, k=5, num_planes=8, buckets=idx).collect()
        ]
        assert a == b
        # metadata wins over a stale caller kwarg: same result even when the
        # caller passes the wrong num_planes alongside the index
        c = [
            (r["vec_id"], r["sim"])
            for r in lsh_knn(emb, 0, k=5, num_planes=12, buckets=idx).collect()
        ]
        assert c == b
    finally:
        idx.unpersist()


def test_lsh_knn_serving_runs_no_driver_action(emb, monkeypatch):
    """With a prebuilt index, lsh_knn must never run `.first()` (the dim
    sniff) — the serving path is action-free until the caller collects."""
    from pyspark.sql import DataFrame as SparkDataFrame

    from linkgraph.textops.simsearch import build_lsh_index

    idx = build_lsh_index(emb, num_planes=8)
    try:
        def _boom(self, *a, **k):
            raise AssertionError("driver action .first() in serving path")

        monkeypatch.setattr(SparkDataFrame, "first", _boom)
        got = [r["vec_id"] for r in lsh_knn(emb, 0, k=5, buckets=idx).collect()]
        assert got and got[0] == 7
    finally:
        monkeypatch.undo()
        idx.unpersist()


def test_minhash_candidate_cache_released(spark, docs):
    """minhash_near_duplicates must not leak the candidate cache (round-3
    wrong #1): after the call, only the returned (persisted) result block
    remains, and unpersisting it returns the session to baseline."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = minhash_near_duplicates(docs, 0.7, 64, 32)
    assert out.count() >= 1
    assert jsc.getPersistentRDDs().size() <= before + 1
    out.unpersist()
    assert jsc.getPersistentRDDs().size() <= before


def test_embedding_near_duplicates_planted(spark):
    """Sign-bucket LSH + exact verify on constructed vectors: a planted
    near-dup pair in one bucket is found with the right cosine; a
    high-cosine pair whose lead signs differ lands in different buckets
    and is (by LSH semantics) not a candidate; sub-threshold same-bucket
    pairs are verified away."""
    from linkgraph.textops.dedup import embedding_near_duplicates

    v = {
        0: [1.0, 1.0, 1.0, 1.0, 0.0],   # bucket 0
        1: [1.0, 1.0, 1.0, 0.9, 0.1],   # bucket 0, cos(0,1) ≈ 0.987
        2: [1.0, 1.0, 1.0, -0.01, 0.0], # bucket 8: near-dup of 0 missed by blocking
        3: [-1.0, 1.0, -1.0, 1.0, 0.0], # bucket 5, orthogonal-ish to all
        4: [0.01, 1.0, 1.0, 1.0, -5.0], # bucket 0, cos(0,4) ≈ 0.29 < τ
    }
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in v.items()],
        "vec_id long, embedding array<float>",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_duplicates(emb, threshold=0.8, planes=4).collect()
    }
    assert set(rows) == {(0, 1)}
    a, b = np.array(v[0]), np.array(v[1])
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(rows[(0, 1)] - expected) < 1e-6
    # exact (unblocked) truth also has (0,2) and (1,2) — vector 2's flipped
    # 4th sign hides both from the blocked path; documents the recall trade
    brute = embedding_near_duplicates(emb, threshold=0.8, planes=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in brute} == {(0, 1), (0, 2), (1, 2)}


def test_ivf_full_probe_equals_brute_force(emb):
    """nprobe = n_centroids probes every cell: IVF must reduce to exact
    brute-force cosine top-k, row-for-row (the driver's correctness gate)."""
    from linkgraph.textops.simsearch import build_ivf_index, ivf_knn

    idx = build_ivf_index(emb, n_centroids=4, iters=3)
    try:
        exact = [(r["vec_id"], r["sim"]) for r in cosine_topk(emb, 0, 10).collect()]
        full = [
            (r["vec_id"], r["sim"])
            for r in ivf_knn(emb, 0, idx, k=10, nprobe=4).collect()
        ]
        assert full == exact
    finally:
        idx.unpersist()


def test_ivf_partial_probe_recall(emb):
    """nprobe=1 touches one cell yet must still recover the planted
    near-duplicate (it shares vector 0's cell by construction), and every
    returned sim must agree with the exact kernel's value."""
    from linkgraph.textops.simsearch import build_ivf_index, ivf_knn

    idx = build_ivf_index(emb, n_centroids=4, iters=3)
    try:
        got = ivf_knn(emb, 0, idx, k=5, nprobe=1).collect()
        assert got and got[0]["vec_id"] == 7
        exact = {r["vec_id"]: r["sim"] for r in cosine_topk(emb, 0, 59).collect()}
        for r in got:
            assert r["sim"] == exact[r["vec_id"]]
        # partial probe is a subset of the corpus
        assert len(got) <= 5
    finally:
        idx.unpersist()


def test_ivf_build_deterministic(emb):
    """Same seed → bit-identical centroid book and assignment table."""
    from linkgraph.textops.simsearch import build_ivf_index

    a = build_ivf_index(emb, n_centroids=4, iters=2, seed=11)
    b = build_ivf_index(emb, n_centroids=4, iters=2, seed=11)
    try:
        assert np.array_equal(a.centroids, b.centroids)
        ra = sorted(map(tuple, a.assignments.collect()))
        rb = sorted(map(tuple, b.assignments.collect()))
        assert ra == rb
    finally:
        a.unpersist()
        b.unpersist()


def test_token_count_total_three_tokenizers(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["Hello, world! 42", "  ", "a-b c_d"],
            }
        )
    )
    from linkgraph.textops.textstats import token_count_total

    row = token_count_total(docs).first()
    assert row["n_docs"] == 3
    # word regex [a-z0-9]+: {hello, world, 42} + {} + {a, b, c, d}
    assert row["total_tokens"] == 3 + 0 + 4
    # whitespace: {Hello, world!, 42} + {} (blank) + {a-b, c_d}
    assert row["total_ws_tokens"] == 3 + 0 + 2
    # BPE-ish runs: {hello},{,},{world},{!},{42} + {} + {a,-,b,c,_,d}
    assert row["total_bpe_tokens"] == 5 + 0 + 6


def test_embedding_near_dup_banded_beats_single_band(spark):
    """The banded random-hyperplane blocking recovers the planted pairs the
    single-band axis-aligned variant provably misses (vector 2's flipped
    4th sign), and its precision is exactly 1: every returned pair appears
    in the unblocked truth with the identical verified cosine."""
    from linkgraph.textops.dedup import (
        embedding_near_duplicates,
        embedding_near_duplicates_banded,
    )

    v = {
        0: [1.0, 1.0, 1.0, 1.0, 0.0],
        1: [1.0, 1.0, 1.0, 0.9, 0.1],
        2: [1.0, 1.0, 1.0, -0.01, 0.0],  # single-band blocking misses (0,2),(1,2)
        3: [-1.0, 1.0, -1.0, 1.0, 0.0],
        4: [0.01, 1.0, 1.0, 1.0, -5.0],
    }
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in v.items()],
        "vec_id long, embedding array<float>",
    )
    single = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(emb, threshold=0.8, planes=4).collect()
    }
    assert (0, 2) not in single and (1, 2) not in single  # the documented miss
    banded = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_duplicates_banded(
            emb, threshold=0.8, bands=8, planes_per_band=4, seed=42
        ).collect()
    }
    truth = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_duplicates(emb, threshold=0.8, planes=0).collect()
    }
    assert set(truth) == {(0, 1), (0, 2), (1, 2)}
    assert set(banded) == set(truth)  # full recall here (seeded, deterministic)
    for k, c in banded.items():
        assert abs(c - truth[k]) < 1e-9  # exact in-place verify → precision 1


def test_simhash_portable_pairs_detects_dup(spark):
    from linkgraph.textops.dedup import simhash_portable_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated text about apples bananas pears kiwi"),
        ],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.hamming for r in simhash_portable_pairs(docs).collect()}
    assert got.get((1, 2)) == 0  # identical docs -> same simhash
    assert (1, 3) not in got and (2, 3) not in got


def test_chapman_estimate_partial_overlap(spark):
    import pytest as _pt

    from linkgraph.textops.dedup import chapman_estimate

    pa = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a long, b long")
    pb = spark.createDataFrame([(3, 4), (7, 8)], "a long, b long")
    r = chapman_estimate(pa, pb).collect()[0]
    # (3+1)(2+1)/(1+1) - 1 = 5
    assert (r.n_a, r.n_b, r.n_both) == (3, 2, 1)
    assert r.n_est == _pt.approx(5.0)
    assert r.coverage_a == _pt.approx(0.6)
    assert r.coverage_b == _pt.approx(0.4)


def test_rrf_fuse_hand_lists(spark):
    import pytest as _pt

    from linkgraph.textops.retrieval import rrf_fuse

    # list A ranks 1,2,3; list B ranks 3,4 — doc 3 fuses ranks (3, 1)
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(3, 0.5), (4, 0.4)], "doc_id long, score double")
    got = {r.doc_id: r for r in rrf_fuse(a, b, kconst=60, k=10).collect()}
    assert got[3].r_a == 3 and got[3].r_b == 1
    assert got[3].rrf == _pt.approx(1 / 63 + 1 / 61, abs=1e-6)
    assert got[1].r_b is None
    assert got[1].rrf == _pt.approx(1 / 61, abs=1e-6)
    # doc in both lists outranks any single-list doc here
    order = sorted(got.values(), key=lambda r: (-r.rrf, r.doc_id))
    assert order[0].doc_id == 3
