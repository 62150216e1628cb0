from __future__ import annotations

import pytest

from flexneuart_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flexneuart_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def assert_rank_identical(got: list[tuple[str, float]], want: list[tuple[str, float]], tol: float = 1e-9):
    """Rank-identity check that tolerates cross-engine float noise:
    positions must match exactly unless the two (engine, oracle) scores at
    a position are within ``tol`` of a neighbouring swap group."""
    assert len(got) == len(want), f"lengths differ: {len(got)} vs {len(want)}"
    i = 0
    n = len(want)
    while i < n:
        # group of oracle entries whose scores are within tol of want[i]
        j = i + 1
        while j < n and abs(want[j][1] - want[i][1]) <= tol * max(1.0, abs(want[i][1])):
            j += 1
        g_ids = sorted(d for d, _ in got[i:j])
        w_ids = sorted(d for d, _ in want[i:j])
        assert g_ids == w_ids, f"rank group [{i},{j}) differs: {got[i:j]} vs {want[i:j]}"
        for (gd, gs), (wd, ws) in zip(got[i:j], want[i:j]):
            assert abs(gs - ws) <= 1e-6 * max(1.0, abs(ws)), f"score mismatch at {gd}: {gs} vs {ws}"
        i = j
