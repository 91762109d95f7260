"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Capabilities (SURVEY.md §2): batched multi-source BFS with bit-parallel
frontier/seen bitsets packed into int64 limb columns (MS-BFS, PVLDB 8(4)
2015), top-k closeness centrality, PageRank, connected components, label
propagation, triangle counting — over a hash-partitioned, skew-salted edge
table derived from tables of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts), plus training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Reference parity note: the reference checkout /root/reference/ was EMPTY
this session (SURVEY.md §0); the spec derives from BASELINE.json and the
published MS-BFS paper. No reference file:line citations are possible.
"""

__version__ = "0.1.0"

from linkgraph.graph import LinkGraph  # noqa: F401
