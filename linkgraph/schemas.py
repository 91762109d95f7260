"""Fixed schemas for every table the engine touches (SURVEY.md §1.2).

One place so Arrow round-trips, checkpoints and tests agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Number of int64 limbs in the packed bitset: 8 * 64 = 512 BFS sources per batch.
NLIMBS = 8
BATCH_WIDTH = NLIMBS * 64  # 512

# Authoritative input contract (BASELINE.json input_hint).
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Dense-id vertex dictionary (CSR relabel analog).
VERTICES = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("conv_id", StringType(), False),
    ]
)

# Directed edge list; undirected graphs carry both directions.
EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
    ]
)


def bfs_state_schema(nlimbs: int = NLIMBS) -> StructType:
    """vid + seen/visit packed bitsets as flat int64 limb columns.

    Flat columns (not array<long>) keep every bitwise step inside
    WholeStageCodegen (SURVEY.md §2.9 K1a / §7 hard-part 1).
    """
    fields = [StructField("vid", LongType(), False)]
    for i in range(nlimbs):
        fields.append(StructField(f"s{i}", LongType(), False))
    for i in range(nlimbs):
        fields.append(StructField(f"v{i}", LongType(), False))
    return StructType(fields)


DISTANCES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("vid", LongType(), False),
        StructField("dist", IntegerType(), False),
    ]
)
