"""Long-sequence loop-closure end-to-end benchmark as a test (VERDICT r03
item 6 / BASELINE configs 4-5): a closed-loop synthetic sequence driven
through the real CLI twice must show `--backend ba+pg` cutting
final-segment ATE by >= 50% vs tracker-only.

~15 minutes of CPU tracking — gated behind MBA_VO_SLOW_TESTS=1 so the
default suite stays fast. The committed artifact from the same harness is
LOOP_r04.json (bench_loop.py: 60 frames / 240x320 / sigma-6 noise ->
90.9% final-quarter improvement, 4 loop-closure events).
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MBA_VO_SLOW_TESTS"),
    reason="long benchmark; set MBA_VO_SLOW_TESTS=1 to run",
)


def test_loop_closure_beats_tracker_only(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import json

    import bench_loop

    out = tmp_path / "loop.json"
    rc = bench_loop.main([
        "--num-frames", "36", "--height", "192", "--width", "256",
        "--noise", "5", "--out", str(out),
    ])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert summary["final_segment_improvement_frac"] >= 0.5, summary
