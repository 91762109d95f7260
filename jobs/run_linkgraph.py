"""spark-submit entrypoint for cluster runs (north_rule deployment path).

    zip -r linkgraph.zip linkgraph
    spark-submit --py-files linkgraph.zip jobs/run_linkgraph.py \
        --input db.transcripts --algo msbfs --sources 512 \
        --checkpoint s3a://bucket/chk/run1 --output db.closeness

On a cluster the session comes from spark-submit confs (no master set
here); locally it falls back to local[*].  The input may be an Iceberg
identifier or a parquet path (tableio abstraction).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="iceberg ident or parquet path (transcripts)")
    p.add_argument("--from-bucketed", default=None, metavar="TABLE",
                   help="load the graph from a bucketed edge table written by a "
                        "previous run's --store-bucketed (skips derivation AND "
                        "the edge-side shuffle: the scan is already "
                        "HashPartitioning(src))")
    p.add_argument("--store-bucketed", default=None, metavar="TABLE",
                   help="after the graph build, persist the shaped edge table as a "
                        "bucketed+sorted table (plus TABLE_verts with the "
                        "vid<->name dictionary) so later jobs reload it join-ready")
    p.add_argument("--store-bucketed-path", default=None,
                   help="explicit storage path for --store-bucketed (defaults to "
                        "the warehouse dir)")
    p.add_argument("--buckets", type=int, default=None,
                   help="bucket count for --store-bucketed (default: "
                        "spark.sql.shuffle.partitions); with --from-bucketed it "
                        "re-registers lost DDL and MUST match the write's count")
    p.add_argument("--algo", required=True,
                   choices=["msbfs", "closeness", "harmonic", "eccentricity", "anf",
                            "pagerank", "ppr", "cc", "lpa", "triangles",
                            "kcore", "betweenness", "khop", "degree",
                            "eigenvector", "vertexsim", "conductance",
                            "degree_hist", "wl", "mst", "coreness",
                            "edge_betweenness", "graphlets", "stdist",
                            "cc2p", "pprpush", "triads"])
    p.add_argument("--edge-key", default="tool", help="shared-key column for conv-conv edges")
    p.add_argument("--hub-cap", type=int, default=100_000,
                   help="0 = plan from sketch stats (suggest_hub_cap, A8)")
    p.add_argument("--salt", action="store_true",
                   help="pre-salt hub sources for the shuffle-join path (J2)")
    p.add_argument("--sources", type=int, default=512, help="MS-BFS batch lanes")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--checkpoint", default=None, help="checkpoint root (resume supported)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", default=None, help="iceberg ident or parquet path")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--k", type=int, default=10,
                   help="kcore: core order; khop: per-hop fanout")
    p.add_argument("--hops", type=int, default=2, help="khop hop count")
    p.add_argument("--seeds", type=int, default=8,
                   help="ppr/betweenness/khop: top-degree seed count")
    args = p.parse_args(argv)

    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.graph import LinkGraph
    from linkgraph.session import get_spark
    from linkgraph.sources.derive import shared_key_conv_edges
    from linkgraph.tableio import read_table, write_table

    if args.from_bucketed is None and args.input is None:
        p.error("either --input or --from-bucketed is required")

    spark = get_spark(app_name=f"linkgraph-{args.algo}")
    t0 = time.time()

    if args.from_bucketed is not None:
        # amortized path: the src shuffle was paid once by --store-bucketed.
        # (path, buckets) re-register the DDL when the local in-memory
        # catalog lost the identifier between processes (no-op on a cluster
        # with a durable metastore)
        graph = LinkGraph.from_bucketed(
            spark, args.from_bucketed,
            path=args.store_bucketed_path, buckets=args.buckets,
        )
        vertices = None
    else:
        transcripts = read_table(spark, args.input)
        hub_cap = args.hub_cap
        if hub_cap == 0:
            from linkgraph.sources.derive import suggest_hub_cap

            hub_cap = suggest_hub_cap(transcripts, key=args.edge_key)
        pairs = shared_key_conv_edges(transcripts, key=args.edge_key, hub_cap=hub_cap)
        graph, vertices = LinkGraph.from_string_vertices(
            pairs, "src_conv", "dst_conv", num_partitions=args.partitions,
            pairs_canonical=True,
        )
    if args.store_bucketed:
        graph.store_bucketed(
            args.store_bucketed, buckets=args.buckets, path=args.store_bucketed_path
        )
        if vertices is not None:
            vw = vertices.write.mode("overwrite")
            if args.store_bucketed_path:
                vw = vw.option("path", args.store_bucketed_path + "_verts")
            vw.saveAsTable(f"{args.store_bucketed}_verts")
    if args.salt:
        graph.enable_salting()
    mgr = CheckpointManager(spark, args.checkpoint) if args.checkpoint else None

    if args.algo in ("msbfs", "closeness", "harmonic", "eccentricity", "anf"):
        from linkgraph.algos.msbfs import (
            closeness,
            eccentricity,
            harmonic,
            msbfs,
            neighborhood_function,
        )

        srcs = graph.top_degree_vids(args.sources)
        res = msbfs(graph, srcs, track_teps=True, checkpoint_mgr=mgr, resume=args.resume)
        out = {
            "harmonic": harmonic,
            "eccentricity": eccentricity,
            "anf": neighborhood_function,
        }.get(args.algo, closeness)(graph, res)
        metrics = {"levels": res.levels, "gteps": res.gteps(),
                   "bit_edge_traversals": res.traversed_bit_edges}
    elif args.algo in ("pagerank", "ppr"):
        from linkgraph.algos.pagerank import pagerank

        sources = graph.top_degree_vids(args.seeds) if args.algo == "ppr" else None
        out = pagerank(graph, tol=args.tol, max_iter=args.max_iter,
                       checkpoint_mgr=mgr, resume=args.resume, sources=sources)
        metrics = {}
    elif args.algo == "cc":
        from linkgraph.algos.components import connected_components

        out = connected_components(graph, max_iter=args.max_iter,
                                   checkpoint_mgr=mgr, resume=args.resume)
        metrics = {}
    elif args.algo == "lpa":
        from linkgraph.algos.labelprop import label_propagation

        out = label_propagation(graph, max_iter=min(args.max_iter, 20),
                                checkpoint_mgr=mgr, resume=args.resume)
        metrics = {}
    elif args.algo == "kcore":
        from linkgraph.algos.kcore import k_core

        out = k_core(graph, args.k)
        metrics = {}
    elif args.algo == "betweenness":
        from linkgraph.algos.betweenness import betweenness

        out = betweenness(graph, sorted(graph.top_degree_vids(args.seeds)))
        metrics = {}
    elif args.algo == "khop":
        from linkgraph.operators.sampling import khop_sample

        out = khop_sample(graph, sorted(graph.top_degree_vids(args.seeds)),
                          [args.k] * args.hops)
        metrics = {}
    elif args.algo == "triangles":
        from linkgraph.algos.triangles import triangles_per_vertex

        out = triangles_per_vertex(graph, by_degree=True)
        metrics = {}
    elif args.algo == "eigenvector":
        from linkgraph.algos.eigen import eigenvector_centrality

        out = eigenvector_centrality(graph, rounds=min(args.max_iter, 8))
        metrics = {}
    elif args.algo == "vertexsim":
        from linkgraph.algos.linkpred import vertex_similarity

        out = vertex_similarity(graph, hub_cap=args.hub_cap, topk=args.k * 100)
        metrics = {}
    elif args.algo == "conductance":
        from pyspark.sql import functions as F

        from linkgraph.algos.gstats import partition_conductance

        labels = graph.vertices().select(
            "vid", (F.col("vid") % max(args.seeds, 2)).alias("label")
        )
        out = partition_conductance(graph, labels)
        metrics = {}
    elif args.algo == "degree_hist":
        from linkgraph.algos.gstats import degree_histogram

        out = degree_histogram(graph)
        metrics = {}
    elif args.algo == "coreness":
        from linkgraph.algos.kcore import coreness

        out = coreness(graph, rounds=None, max_rounds=args.max_iter)
        metrics = {}
    elif args.algo == "edge_betweenness":
        from linkgraph.algos.betweenness import edge_betweenness

        roots = sorted(graph.top_degree_vids(args.seeds))
        out = edge_betweenness(graph, roots, topk=args.k * 100)
        metrics = {}
    elif args.algo == "graphlets":
        from linkgraph.algos.triangles import graphlet_census

        out = graphlet_census(graph)
        metrics = {}
    elif args.algo == "wl":
        from linkgraph.algos.wl import wl_refine

        out = wl_refine(graph, rounds=min(args.max_iter, 3))
        metrics = {}
    elif args.algo == "mst":
        from pyspark.sql import functions as F

        from linkgraph.algos.mst import minimum_spanning_forest

        # unweighted conv graph: w=1 everywhere -> the (u,v)-lexicographic
        # spanning forest (ties broken by the strict total order)
        out = minimum_spanning_forest(
            graph.edges.select("src", "dst", F.lit(1).alias("w"))
        )
        metrics = {}
    elif args.algo == "cc2p":
        from linkgraph.algos.components import connected_components_two_phase

        out = connected_components_two_phase(graph, max_rounds=args.max_iter)
        metrics = {}
    elif args.algo == "pprpush":
        from linkgraph.algos.pagerank import ppr_forward_push

        seeds = sorted(graph.top_degree_vids(args.seeds))
        out = ppr_forward_push(graph, seeds, rounds=None,
                               max_rounds=args.max_iter)
        metrics = {"seeds": len(seeds)}
    elif args.algo == "triads":
        from linkgraph.algos.triads import triad_census

        out = triad_census(graph.edges.select("src", "dst"))
        metrics = {}
    elif args.algo == "stdist":
        from linkgraph.algos.bidir import st_distance

        # point-to-point: hub -> farthest-id vertex by default (the driver
        # query's deterministic pair); max_iter bounds total expansions
        s, t = sorted(graph.top_degree_vids(2))
        out = st_distance(graph, int(s), int(t), max_rounds=args.max_iter)
        metrics = {}
    else:  # degree
        out = graph.degrees()
        metrics = {}

    if args.output:
        write_table(out, args.output)
        n = None
    else:
        n = out.count()

    print(json.dumps({
        "algo": args.algo, "wall_sec": round(time.time() - t0, 2),
        "V": graph.num_vertices(), "E_directed": graph.num_edges(),
        "rows_out": n, **metrics,
    }))


if __name__ == "__main__":
    sys.exit(main())
