"""Packed-bitset helpers: 512 BFS lanes as 8 int64 limb columns.

Bit j of the batch lives in limb j//64, bit position j%64 (little-endian).
All Spark-side bit math is plain int64 `&`, `|`, `~`, bit_or, bit_count —
JVM codegen, no UDFs (SURVEY.md §2.9 K1a).  numpy kernels view the limbs
as uint64 for safe shifting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from linkgraph.schemas import NLIMBS


def limb_names(prefix: str, nlimbs: int = NLIMBS) -> list[str]:
    return [f"{prefix}{i}" for i in range(nlimbs)]


def pack_sources(sources: list[int], nlimbs: int = NLIMBS) -> pd.DataFrame:
    """sources[j] gets bit j. Returns pandas state: vid, s0..s{L-1}, v0..v{L-1}.

    A vid appearing multiple times gets the OR of its lanes' bits.
    """
    width = nlimbs * 64
    if len(sources) > width:
        raise ValueError(f"batch width {width} < {len(sources)} sources")
    vids = sorted(set(int(v) for v in sources))
    index = {v: i for i, v in enumerate(vids)}
    limbs = np.zeros((len(vids), nlimbs), dtype=np.uint64)
    for j, v in enumerate(sources):
        limbs[index[int(v)], j // 64] |= np.uint64(1) << np.uint64(j % 64)
    signed = limbs.view(np.int64)
    data = {"vid": np.asarray(vids, dtype=np.int64)}
    for i in range(nlimbs):
        data[f"s{i}"] = signed[:, i]
    for i in range(nlimbs):
        data[f"v{i}"] = signed[:, i]
    return pd.DataFrame(data)


def limbs_to_bits(limbs: np.ndarray) -> np.ndarray:
    """(rows, nlimbs) uint64 -> (rows, nlimbs*64) uint8 bit matrix."""
    u8 = (
        np.ascontiguousarray(limbs, dtype=np.uint64)
        .view(np.uint8)
        .reshape(limbs.shape[0], -1)
    )
    return np.unpackbits(u8, axis=1, bitorder="little")


def popcount_per_lane(limbs: np.ndarray) -> np.ndarray:
    """(rows, nlimbs) uint64 -> per-lane set-bit counts, shape (nlimbs*64,)."""
    if limbs.shape[0] == 0:
        return np.zeros(limbs.shape[1] * 64, dtype=np.int64)
    return limbs_to_bits(limbs).sum(axis=0).astype(np.int64)
