"""Round-5 third wave: FastRP embeddings, SQ8 quantization, leakage-safe
dedup-aware split."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _seed(vid: int, j: int) -> int:
    h = int(hashlib.md5(f"{vid}#frp#{j}".encode()).hexdigest()[:15], 16)
    return {0: 1, 1: -1}.get(h % 4, 0)


@pytest.fixture(scope="module")
def tiny(spark):
    # directed edges, both directions present (the derived-graph shape)
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return LinkGraph(
        spark.createDataFrame(edges, "src long, dst long"),
        num_partitions=4,
        symmetric=False,
    )


def test_fastrp_matches_numpy(spark, tiny):
    from linkgraph.algos.fastrp import fastrp_embeddings

    dims, w = 8, (1, 2)
    out = fastrp_embeddings(tiny, dims=dims, weights=w, hash_mode="md5")
    got = {r["vid"]: [r[f"e{j}"] for j in range(dims)] for r in out.collect()}

    vids = sorted(got)
    n = len(vids)
    idx = {v: i for i, v in enumerate(vids)}
    A = np.zeros((n, n), dtype=np.int64)
    for r in tiny.edges.collect():
        A[idx[r["dst"]], idx[r["src"]]] += 1  # h'(v) = sum over in-neighbors
    R = np.array(
        [[_seed(v, j) for j in range(dims)] for v in vids], dtype=np.int64
    )
    m1 = A @ R
    m2 = A @ m1
    comb = w[0] * m1 + w[1] * m2
    norms = np.sqrt((comb.astype(float) ** 2).sum(axis=1))
    for v in vids:
        e = comb[idx[v]].astype(float)
        expect = e / norms[idx[v]] if norms[idx[v]] > 0 else e * 0.0
        assert np.allclose(got[v], expect, atol=1e-12), v


def test_fastrp_rows_are_unit_norm(tiny):
    from linkgraph.algos.fastrp import fastrp_embeddings

    out = fastrp_embeddings(tiny, dims=8, weights=(1, 2), hash_mode="md5")
    sq = None
    for j in range(8):
        t = F.col(f"e{j}") * F.col(f"e{j}")
        sq = t if sq is None else sq + t
    rows = out.select(sq.alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 or r["s"] == 0.0 for r in rows)


def test_fastrp_feeds_ann_stack(tiny):
    from linkgraph.algos.fastrp import as_embedding_vectors, fastrp_embeddings

    vecs = as_embedding_vectors(
        fastrp_embeddings(tiny, dims=8, weights=(1, 2), hash_mode="md5")
    )
    assert vecs.columns == ["vec_id", "embedding"]
    row = vecs.first()
    assert len(row["embedding"]) == 8


def test_fastrp_validation(tiny):
    from linkgraph.algos.fastrp import fastrp_embeddings

    with pytest.raises(ValueError):
        fastrp_embeddings(tiny, dims=0)
    with pytest.raises(ValueError):
        fastrp_embeddings(tiny, weights=())


def test_quantize_codes_error_bound(spark, sf0001):
    from linkgraph.textops.quant import quantization_stats, quantize_codes

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    stats = {r["dim"]: (r["mn"], r["mx"]) for r in quantization_stats(emb).collect()}
    codes = quantize_codes(emb)
    worst = codes.groupBy("dim").agg(F.max("err").alias("e")).collect()
    for r in worst:
        mn, mx = stats[r["dim"]]
        # half a quantization step, plus rounding slack
        assert r["e"] <= (mx - mn) / (2 * 255) + 1e-9, r


def test_quantize_vectors_matches_long_form(spark, sf0001):
    from linkgraph.textops.quant import quantize_codes, quantize_vectors

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet").limit(50)
    long = {
        (r["vec_id"], r["dim"]): r["code"] for r in quantize_codes(emb).collect()
    }
    for r in quantize_vectors(emb).collect():
        for d, c in enumerate(r["embedding"]):
            assert long[(r["vec_id"], d)] == c


def test_fastrp_ann_topk_is_sorted_and_bounded(spark, sf0001):
    from linkgraph.entry_queries import q_fastrp_ann_topk

    rows = q_fastrp_ann_topk(spark, sf0001).collect()
    assert len(rows) == 10
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


def test_dedup_split_no_cluster_leakage(spark, sf0001):
    from linkgraph.entry_queries import q_dedup_split

    out = q_dedup_split(spark, sf0001)
    bad = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert bad == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
