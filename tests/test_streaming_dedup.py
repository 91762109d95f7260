"""Streaming dedup: after draining multi-batch drops, the incremental
near-dup store equals the batch MinHash pipeline over all unique documents
seen so far — including a near-dup pair whose members arrive in DIFFERENT
batches — and the watermarked exact layer keeps exactly one document per
content digest across batch boundaries."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.streaming.dedup import IncrementalDedupStore, run_dedup_ingest
from linkgraph.textops.dedup import minhash_near_duplicates

BASE = [
    "the quick brown fox jumps over the lazy dog and runs far away today",
    "pyspark dataframes shuffle data between executors during wide operations",
    "minhash signatures approximate jaccard similarity between token sets",
    "structured streaming processes microbatches with bounded state stores",
    "completely unrelated text about cooking pasta with garlic and olive oil",
]


def _doc_rows():
    """3 drops; near-dup pairs within AND across drops, exact dups across."""
    rows = []  # (doc_id, text, drop)

    def add(i, text, drop):
        rows.append((i, text, drop))

    # drop 0: originals
    for i, t in enumerate(BASE):
        add(i, t, 0)
    # drop 0: in-batch near-dup of doc 0 (one word changed)
    add(10, BASE[0].replace("lazy", "sleepy"), 0)
    # drop 1: CROSS-BATCH near-dup of doc 1 (one word changed)
    add(11, BASE[1].replace("wide", "broad"), 1)
    # drop 1: CROSS-BATCH exact duplicate of doc 2 (same text, new id)
    add(12, BASE[2], 1)
    # drop 2: near-dup of doc 3 arriving two batches later
    add(13, BASE[3].replace("bounded", "limited"), 2)
    # drop 2: exact replay of doc 0's text
    add(14, BASE[0], 2)
    # drop 2: fresh unique doc
    add(15, "entirely new content arriving in the final batch of the stream", 2)
    return rows


@pytest.fixture()
def doc_drops(spark, tmp_path):
    src = str(tmp_path / "doc_src")
    os.makedirs(src)
    for drop in range(3):
        pdf = pd.DataFrame(
            [
                {
                    "doc_id": i,
                    "text": t,
                    "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=drop),
                }
                for i, t, d in _doc_rows()
                if d == drop
            ]
        )
        spark.createDataFrame(
            pdf, schema="doc_id long, text string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"d{drop}"))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for drop in range(3):
        d = os.path.join(src, f"d{drop}")
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(flat, f"f{drop}_{n}.parquet"))
                n += 1
    return flat


def test_streaming_dedup_equals_batch(spark, tmp_path, doc_drops):
    store = IncrementalDedupStore(
        str(tmp_path / "ndstore"), threshold=0.5, num_hashes=64, bands=16
    )
    run_dedup_ingest(
        spark,
        doc_drops,
        store,
        str(tmp_path / "chk"),
        available_now=True,
        max_files_per_trigger=1,  # one microbatch per drop file
    )

    # ---- exact layer: one survivor per digest, digest set == unique texts
    docs = store.documents(spark)
    kept = [(r["doc_id"], r["text"]) for r in docs.collect()]
    texts = [t for _, t in kept]
    assert len(texts) == len(set(texts)), "exact duplicate text survived"
    expected_texts = {t for _, t, _ in _doc_rows()}
    assert set(texts) == expected_texts  # one per digest, none lost
    # the cross-batch exact dups (12, 14) must NOT have survived: their
    # texts arrived first as docs 2 and 0
    kept_ids = {i for i, _ in kept}
    assert 2 in kept_ids and 12 not in kept_ids
    assert 0 in kept_ids and 14 not in kept_ids

    # ---- near-dup layer: incremental pairs == batch pipeline over the
    # deduped corpus, including the cross-batch pairs (1,11) and (3,13)
    got = {
        (r["a"], r["b"], r["jac"])
        for r in store.near_dup_pairs(spark).collect()
    }
    batch_out = minhash_near_duplicates(docs, threshold=0.5, num_hashes=64, bands=16)
    exp = {(r["a"], r["b"], r["jac"]) for r in batch_out.collect()}
    batch_out.unpersist()
    assert got == exp
    pairs_only = {(a, b) for a, b, _ in got}
    assert (0, 10) in pairs_only  # in-batch near-dup
    assert (1, 11) in pairs_only  # cross-batch near-dup (drop 0 -> 1)
    assert (3, 13) in pairs_only  # cross-batch near-dup (drop 0 -> 2)
