"""sequence_pack vs an exact pure-python concat-and-chop oracle."""

import re

import pytest

from linkgraph.textops.packing import sequence_pack
from linkgraph.textops.textstats import BPE_RE


def _bpe_count(text: str) -> int:
    return len(re.findall(BPE_RE, text.lower()))


def _python_pack(rows, seq_len):
    placed, acc = {}, 0
    for doc_id, text in sorted(rows):
        n = _bpe_count(text)
        if n == 0:
            continue
        start = acc
        acc += n
        placed[doc_id] = (
            n,
            start,
            start // seq_len,
            (start + n - 1) // seq_len,
        )
    return placed


ROWS = [
    (3, "alpha beta gamma delta " * 7),
    (1, "one two three"),
    (7, ""),  # zero tokens — must be dropped
    (2, "x" * 95),  # one long letter run = 1 token
    (9, "punctuation, heavy!! text; with 42 numbers and words " * 11),
    (5, "short"),
    (4, "the quick brown fox jumps over the lazy dog " * 3),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_pack_matches_python_oracle(docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_start"], r["seq_end"])
        for r in sequence_pack(docs, seq_len=16).collect()
    }
    assert got == _python_pack(ROWS, 16)


def test_pack_stream_is_gapless(docs):
    rows = sorted(
        sequence_pack(docs, seq_len=16).collect(), key=lambda r: r["doc_id"]
    )
    acc = 0
    for r in rows:
        assert r["tok_start"] == acc
        acc += r["n_tokens"]


def test_pack_spanning_doc_and_n_seqs(docs):
    rows = {r["doc_id"]: r for r in sequence_pack(docs, seq_len=16).collect()}
    # doc 3 has 28 tokens: under seq_len=16 it must span >= 2 sequences
    assert rows[3]["n_seqs"] >= 2
    for r in rows.values():
        assert r["n_seqs"] == r["seq_end"] - r["seq_start"] + 1
        assert 7 not in rows  # empty doc dropped


def test_pack_rejects_nonpositive_seq_len(docs):
    with pytest.raises(ValueError):
        sequence_pack(docs, seq_len=0)


def test_chunk_plan_exact(spark):
    import re

    from linkgraph.textops.packing import chunk_plan
    from linkgraph.textops.textstats import BPE_RE

    texts = {
        0: "one two three four five six seven eight nine ten",  # 10 tokens
        1: "a b c",                                             # 3 tokens
        2: "",                                                  # dropped
        3: "x " * 7,                                            # exactly 7
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    W, S = 4, 3
    got = {}
    for r in chunk_plan(docs, window=W, stride=S).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.tok_start, r.tok_end))
    want = {}
    for i, t in texts.items():
        n = len(re.findall(BPE_RE, t.lower()))
        if n == 0:
            continue
        n_chunks = 1 + (max(n - W, 0) + S - 1) // S
        want[i] = [(c, c * S, min(c * S + W, n)) for c in range(n_chunks)]
    for k in got:
        got[k].sort()
    assert got == want
    # coverage: chunks tile every token and the last chunk ends at n
    for i, chunks in want.items():
        assert chunks[0][1] == 0 and chunks[-1][2] >= chunks[-1][1]
        for (c1, s1, e1), (c2, s2, e2) in zip(chunks, chunks[1:]):
            assert s2 <= e1  # overlap or contiguous: no skipped tokens
