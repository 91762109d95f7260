"""Deterministic synthetic transcript fixtures (FIXTURES.md §B, seed=42).

Generates the engine's native input table — multi-turn conversation/agent
transcripts with columns (conv_id, turn_idx, role, text, tool, ts) — plus
small hand-built graphs with known ground truth.  No external data, fully
deterministic, vectorized in numpy/pandas (no per-row Python loops beyond
string formatting at fixture scale).
"""

from __future__ import annotations

import datetime as _dt
import hashlib

import numpy as np
import pandas as pd

SEED = 42
ROLES = ["user", "assistant", "tool"]
N_TOOLS = 200
ZIPF_S = 1.2


def _sha12(conv_id: str, turn_idx: int) -> str:
    return hashlib.sha1(f"{conv_id},{turn_idx}".encode()).hexdigest()[:12]


def make_transcripts(n_convs: int = 200) -> pd.DataFrame:
    """Deterministic transcripts; Zipf-skewed tool usage creates hub tools."""
    rng = np.random.default_rng(SEED)
    # turns per conv: deterministic function of idx in [3, 40]
    idx = np.arange(n_convs)
    n_turns = 3 + (idx * 2654435761 % 38)  # Knuth-hash spread, deterministic

    conv_rep = np.repeat(idx, n_turns)
    turn_idx = np.concatenate([np.arange(t) for t in n_turns])
    roles = np.array(ROLES)[turn_idx % 3]
    # occasional named agents for shared-actor edges
    agent_mask = (conv_rep + turn_idx) % 17 == 0
    agents = np.char.add("agent_", ((conv_rep * 7 + turn_idx) % 16).astype(str))
    roles = np.where(agent_mask, agents, roles)

    # Zipf(s=1.2) tool ids on tool-role turns only (deterministic draw)
    zipf_ranks = np.arange(1, N_TOOLS + 1, dtype=np.float64)
    probs = zipf_ranks ** (-ZIPF_S)
    probs /= probs.sum()
    tool_draw = rng.choice(N_TOOLS, size=conv_rep.shape[0], p=probs)
    is_tool_turn = turn_idx % 3 == 2
    tools = np.where(is_tool_turn, np.char.add("tool_", tool_draw.astype(str)), None)

    conv_ids = np.char.add("c", np.char.zfill(conv_rep.astype(str), 8))
    texts = [
        f"turn {t} of {c}: {_sha12(c, t)}"
        for c, t in zip(conv_ids.tolist(), turn_idx.tolist())
    ]
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = pd.Series(
        base + (conv_rep.astype("int64") * 60 + turn_idx.astype("int64")) * np.timedelta64(1_000_000, "us")
    )
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark, n_convs: int = 200):
    from linkgraph.schemas import TRANSCRIPTS

    return spark.createDataFrame(make_transcripts(n_convs), schema=TRANSCRIPTS)


# ---------------------------------------------------------------- known graphs
def grid_edges(rows: int = 8, cols: int = 8) -> list[tuple[int, int]]:
    """8x8 grid: CC=1, triangles=0, BFS dist = manhattan distance."""
    e = []
    for r in range(rows):
        for c in range(cols):
            v = r * cols + c
            if c + 1 < cols:
                e.append((v, v + 1))
            if r + 1 < rows:
                e.append((v, v + cols))
    return e


def two_cliques_edges(k: int = 10) -> list[tuple[int, int]]:
    """Two K_k cliques joined by one bridge (0 — k). triangles = 2*C(k,3)."""
    e = [(i, j) for i in range(k) for j in range(i + 1, k)]
    e += [(k + i, k + j) for i in range(k) for j in range(i + 1, k)]
    e.append((0, k))
    return e


def er_edges(n: int = 500, p: float = 0.02, seed: int = SEED) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    iu = np.triu_indices(n, k=1)
    sel = mask[iu]
    return list(zip(iu[0][sel].tolist(), iu[1][sel].tolist()))


def edges_df(spark, pairs: list[tuple[int, int]]):
    """Undirected pairs -> symmetric directed Spark edge DataFrame."""
    from linkgraph.schemas import EDGES

    both = pairs + [(b, a) for a, b in pairs]
    both = sorted(set((int(a), int(b)) for a, b in both if a != b))
    pdf = pd.DataFrame(both, columns=["src", "dst"])
    return spark.createDataFrame(pdf, schema=EDGES)
