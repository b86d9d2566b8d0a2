"""Planted-truth invariants of the STREAMSCALE interval-join section at
pytest size.

tools/streamscale.py certifies the watermarked left-outer stream-stream
interval join at 20M events against closed-form planted truth (matched
3L/4, unmatched L/4, end-of-run state == the 2 sentinels); this pins the
same invariants at pytest size so a regression in the join operator, the
time-sliced replay, or the eviction accounting is caught by CI, not only
by the long-running artifact run.
"""

from __future__ import annotations

import shutil

import pytest

import tools.streamscale as ss


@pytest.fixture(scope="module", autouse=True)
def _work(tmp_path_factory):
    old = ss.WORK
    ss.WORK = str(tmp_path_factory.mktemp("planted_stream"))
    yield
    shutil.rmtree(ss.WORK, ignore_errors=True)
    ss.WORK = old


def test_interval_join_planted_truth(spark):
    # L = 40,000 left + 30,000 planted right matches + 5,000 right-only
    n = 80_000
    res = ss.run_join(spark, n)
    L = (n // 8) * 4
    n_in = L + L * 3 // 4 + L // 8 + 2
    for tag in ("interval_join", "interval_join_full"):
        r = res[tag]
        assert r["ok"], r
        # the verify string embeds the exact closed-form counts;
        # re-assert the structural bounds independently of the string
        assert r["micro_batches"] >= 20  # 41 files at 2/trigger
        assert r["state_rows"] < 0.2 * n_in
