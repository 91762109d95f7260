"""Greedy submodular coverage selection over document n-grams.

Data-selection pipelines prune a corpus to a budget while keeping
DIVERSITY — the standard formalization is maximum-coverage (facility
location): pick k documents maximizing the number of distinct n-grams
covered.  Greedy argmax-of-marginal-gain is the classic (1 - 1/e)
approximation [Nemhauser et al. 1978] and the shape used by coreset /
data-pruning work.

Scale shape: the corpus collapses ONCE to a (doc_id, gram) distinct
table (explode + distinct — `text` never moves again); each of the k
rounds is one broadcast anti-join against the covered-gram set + one
map-side-combined count + a TakeOrdered(1); the covered set grows by
one document's grams per round (bounded by the corpus' distinct grams,
checkpointed to keep the iterative plan flat).  The driver sees k
single-row actions — bounded scalars, the same budgetary shape as the
frontier counts in sssp.py.  k is a user budget (5-50), never corpus-
sized; for corpus-scale selection the known path is stochastic-greedy
over a sampled candidate pool (documented, same kernel).

Determinism: argmax ties break (gain desc, doc_id asc) — total order,
engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.collocations import _grams


def greedy_doc_cover(
    docs: DataFrame, k: int = 5, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(rank, doc_id, gain): the k greedily-selected documents with each
    pick's marginal distinct-n-gram gain, rank 1..k in pick order.
    Stops early (fewer rows) once every gram is covered.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    spark = docs.sparkSession
    g = (
        docs.select("doc_id", F.explode(_grams(n, text_col)).alias("gram"))
        .distinct()
        .persist()
    )
    remaining = g
    picks = []
    for rank in range(1, k + 1):
        best = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        doc_id, gain = best[0]["doc_id"], best[0]["gain"]
        picks.append((rank, doc_id, gain))
        covered = g.where(F.col("doc_id") == F.lit(doc_id)).select("gram")
        remaining = remaining.join(
            F.broadcast(covered), "gram", "left_anti"
        ).localCheckpoint(eager=False)
    g.unpersist()
    return spark.createDataFrame(
        picks, "rank int, doc_id long, gain long"
    ).orderBy("rank")
