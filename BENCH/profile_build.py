"""Phase-level profile of the bench's build_zipf_graph (its most expensive
query, ~47% of the sf0.1 suite): where do the seconds go?

Phases timed independently (each materialized with a count):
  fixture     driver-side deterministic transcript synthesis + createDataFrame
  derive      shared_key_conv_edges (distinct conv-key index, capped self-join,
              canonical pair distinct)
  relabel     degree count + two-phase dense ids + byte-gated dict joins
  closure     symmetric union (distinct skipped: canonical input)
  materialize parquet round-trip + partitioned/sorted columnar cache + count

Usage: python BENCH/profile_build.py [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    from pyspark.storagelevel import StorageLevel

    from linkgraph.fixtures import transcripts_df
    from linkgraph.graph import LinkGraph, _dense_ids, relabel_pairs
    from linkgraph.session import get_spark
    from linkgraph.sources.derive import shared_key_conv_edges
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="profile-build",
    )
    t = {}

    t0 = time.time()
    tr = transcripts_df(spark, n_convs=n_convs)
    if os.environ.get("PROFILE_ROUNDTRIP", "1") == "1":
        # the production input is a TABLE (Iceberg per input_hint); a
        # driver-side LocalRelation fixture embeds 430k rows into every
        # downstream logical plan and costs seconds of driver time per job
        import tempfile, uuid
        p = os.path.join(tempfile.gettempdir(), f"tr_{uuid.uuid4().hex}")
        tr.write.parquet(p)
        tr = spark.read.parquet(p)
    else:
        tr = tr.persist(StorageLevel.MEMORY_AND_DISK)
    n_rows = tr.count()
    t["fixture"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = shared_key_conv_edges(tr, key="tool", hub_cap=500)
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    t["derive"] = round(time.time() - t0, 2)

    t0 = time.time()
    occ = pairs.select(F.col("src_conv").alias("name")).union(
        pairs.select(F.col("dst_conv").alias("name"))
    )
    deg = occ.groupBy("name").agg(F.count("*").alias("deg"))
    vertices, nv = _dense_ids(deg)
    t["dense_ids"] = round(time.time() - t0, 2)

    t0 = time.time()
    relabeled = relabel_pairs(pairs, vertices, "src_conv", "dst_conv", n_vertices=nv)
    relabeled = relabeled.persist(StorageLevel.MEMORY_AND_DISK)
    relabeled.count()
    t["relabel"] = round(time.time() - t0, 2)

    t0 = time.time()
    g = LinkGraph.from_undirected(relabeled, distinct=False)
    ne = g.num_edges()
    t["closure_materialize"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "n_convs": n_convs,
                "rows": n_rows,
                "pairs": n_pairs,
                "V": nv,
                "E_directed": ne,
                "phase_sec": t,
                "total_sec": round(sum(t.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
