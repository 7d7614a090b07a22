"""Unit tests for the segmentation planner + slices (utils.py) — the
shared rule behind every bounded-execution dispatch split."""

import numpy as np

from tokenflow_tpu.utils import plan_seg_len, segment_slices


def test_segment_slices_cover_exactly():
    for n, seg in [(50, 20), (8, 3), (4, 1), (5, 5), (5, 9), (7, 0)]:
        sls = segment_slices(n, seg)
        idx = np.concatenate([np.arange(n)[s] for s in sls])
        np.testing.assert_array_equal(idx, np.arange(n))
        if 0 < seg < n:
            assert all(s.stop - s.start <= seg for s in sls)
        else:
            assert sls == [slice(0, n)]


def test_plan_seg_len_prefers_divisor():
    # the VERDICT round-3 case: 50 steps @ cap 20 must become 5x10 (one
    # compiled program), not 20+20+10 (two)
    assert plan_seg_len(50, 20) == 10
    assert plan_seg_len(50, 25) == 25
    assert plan_seg_len(50, 10) == 10
    assert plan_seg_len(8, 3) == 2
    assert plan_seg_len(4, 3) == 2
    assert plan_seg_len(120, 24) == 24
    assert plan_seg_len(120, 23) == 20


def test_plan_seg_len_rejects_tiny_divisors():
    # near-prime n: the only divisor (1) would explode the dispatch
    # count, so the naive cap-plus-tail split (2 programs) is kept
    assert plan_seg_len(47, 20) == 20
    assert plan_seg_len(5, 3) == 3


def test_plan_seg_len_no_split_passthrough():
    assert plan_seg_len(10, 0) == 0
    assert plan_seg_len(10, 10) == 10
    assert plan_seg_len(10, 99) == 99


def test_plan_seg_len_multiple_of():
    # frames-mesh constraint: segments must stay device-count multiples
    assert plan_seg_len(120, 50, multiple_of=8) == 40
    assert plan_seg_len(120, 23, multiple_of=8) == 23  # no mult-of-8 divisor <= 23 worth it
    assert plan_seg_len(64, 24, multiple_of=8) == 16


def test_plan_seg_len_never_exceeds_cap():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(2, 200))
        cap = int(rng.integers(1, n))
        planned = plan_seg_len(n, cap)
        assert 1 <= planned <= cap
        # coverage with the planned length is exact
        sls = segment_slices(n, planned)
        assert sum(s.stop - s.start for s in sls) == n
