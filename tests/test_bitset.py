import numpy as np

from linkgraph.operators.bitset import limbs_to_bits, pack_sources, popcount_per_lane


def test_pack_sources_roundtrip():
    sources = [5, 9, 5, 123, 7]  # vid 5 carries lanes 0 and 2
    pdf = pack_sources(sources)
    assert sorted(pdf["vid"]) == [5, 7, 9, 123]
    limbs = pdf[[f"v{i}" for i in range(8)]].to_numpy().view(np.uint64)
    bits = limbs_to_bits(limbs)
    by_vid = dict(zip(pdf["vid"], bits))
    assert by_vid[5][0] == 1 and by_vid[5][2] == 1 and by_vid[5][1] == 0
    assert by_vid[9][1] == 1
    assert by_vid[123][3] == 1
    assert by_vid[7][4] == 1


def test_pack_sources_high_lanes():
    # lanes ≥ 64 cross limbs; lane 511 is the top bit of limb 7
    sources = list(range(1000, 1512))
    pdf = pack_sources(sources)
    row = pdf[pdf.vid == 1511].iloc[0]
    assert np.uint64(row["v7"].astype(np.int64).view(np.uint64) if hasattr(row["v7"], "astype") else row["v7"])
    assert np.int64(row["v7"]) == np.int64(np.uint64(1) << np.uint64(63)).view(np.int64) or row["v7"] < 0


def test_popcount_per_lane():
    pdf = pack_sources([0, 1, 2, 70])
    limbs = pdf[[f"v{i}" for i in range(8)]].to_numpy().view(np.uint64)
    counts = popcount_per_lane(limbs)
    assert counts[:4].tolist() == [1, 1, 1, 1]
    assert counts.sum() == 4
