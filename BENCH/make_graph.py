"""One-time builder for the scaling-bench graph (BASELINE.md dataset 2):
Zipf hub-tool link graph from synthetic transcripts at M=10^5 conversations
(seed=42), written as a symmetric directed edge parquet so both parallelism
levels read the identical input.

Usage: python BENCH/make_graph.py [n_convs] [hub_cap] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hub_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "BENCH", "data", f"zipf_{n_convs}")

    from linkgraph.fixtures import transcripts_df
    from linkgraph.graph import LinkGraph
    from linkgraph.session import get_spark
    from linkgraph.sources.derive import shared_key_conv_edges

    spark = get_spark(master="local[32]", app_name="make-bench-graph")
    t0 = time.time()
    t = transcripts_df(spark, n_convs=n_convs)
    pairs = shared_key_conv_edges(t, key="tool", hub_cap=hub_cap)
    g, verts = LinkGraph.from_string_vertices(
        pairs, "src_conv", "dst_conv", pairs_canonical=True
    )
    g.edges.write.mode("overwrite").parquet(os.path.join(out, "edges"))
    meta = {
        "n_convs": n_convs,
        "hub_cap": hub_cap,
        "V": g.num_vertices(),
        "E_directed": g.num_edges(),
        "build_sec": round(time.time() - t0, 1),
        "seed": 42,
    }
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))
    spark.stop()


if __name__ == "__main__":
    main()
