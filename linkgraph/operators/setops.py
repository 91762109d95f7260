"""Key-level set operations over vertex/entity tables (SURVEY.md J3/J4/U2/U3).

Set semantics are expressed as anti/semi equi-joins rather than
exceptAll/intersect row-operators: the join form keys on the id column
only (no full-row compare-and-sort), pushes through AQE like any other
equi-join, and broadcast-gates the right side — the shape that survives a
10^9-row vertex table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def except_keys(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of `left` whose key does NOT appear in `right` (U2/J3).

    The left-anti join is the engine's set-difference operator: unvisited
    vertices (vertices ∖ seen), BFS-completion accounting, customers
    without orders, etc."""
    return left.join(right, on, "left_anti")


def intersect_keys(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of `left` whose key DOES appear in `right` (U3/J4)."""
    return left.join(right, on, "left_semi")
