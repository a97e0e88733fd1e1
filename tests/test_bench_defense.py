"""Hot-host defense in bench.py (r12 verdict task #1).

The driver's bench capture is the judged artifact and can launch on a
host that is still hot from the preceding correctness sweep (the r12
driver capture ran a uniform 1.22x over a quiet-box run of the same
tree). bench.py defends in two layers — a pre-JVM settle gate on the
load average and a per-row outlier re-run against the committed
quiet-box reference mins — and both must be deterministic, bounded,
and side-effect-free, which is what these tests pin. No SparkSession
needed.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_canary_is_positive_and_bounded():
    c = bench._canary_sec()
    assert 0 < c < 5.0  # ~60 ms idle; anything near 5 s means a broken loop


def test_settle_gate_respects_zero_budget(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SETTLE_SEC", "0")
    out = bench.settle_gate(cpus=32)
    # budget 0 => exactly one probe, no sleeping, well-formed record
    assert out["waited_sec"] < 5.0
    assert out["budget_sec"] == 0.0
    assert out["thresh"] == max(4.0, 0.2 * 32)
    assert len(out["probes"]) == 1
    assert {"t", "load1", "canary"} <= set(out["probes"][0])
    assert isinstance(out["settled"], bool)


def test_reference_mins_read_committed_captures(tmp_path):
    # full capture provides the base; subset rows fill gaps but the
    # full capture wins where both exist (update order: subset first)
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"sf": 0.1, "queries_min": {"a": 1.0, "b": 2.0}})
    )
    (tmp_path / "BENCH_DETAIL_subset.json").write_text(
        json.dumps({"sf": 0.1, "queries_min": {"b": 9.0, "c": 3.0}})
    )
    ref = bench._load_reference_mins(str(tmp_path), 0.1)
    assert ref == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_reference_mins_require_matching_sf(tmp_path):
    # a capture at a different scale factor is not a valid reference:
    # rows are only min-comparable at the same SF
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"sf": 0.01, "queries_min": {"a": 1.0}})
    )
    assert bench._load_reference_mins(str(tmp_path), 0.1) == {}
    assert bench._load_reference_mins(str(tmp_path), 0.01) == {"a": 1.0}


def test_reference_mins_tolerate_missing_or_corrupt(tmp_path):
    assert bench._load_reference_mins(str(tmp_path), 0.1) == {}
    (tmp_path / "BENCH_DETAIL.json").write_text("not json")
    assert bench._load_reference_mins(str(tmp_path), 0.1) == {}


def test_hot_retry_no_reference_is_a_noop():
    samples = [10.0, 11.0]
    extra, hot = bench.hot_retry(samples, None, lambda: pytest.fail("ran"))
    assert (extra, hot) == (0, False)
    assert samples == [10.0, 11.0]


def test_hot_retry_quiet_row_is_a_noop():
    # 1.4x the reference: under the 1.5x gate, no retries
    samples = [1.4]
    extra, hot = bench.hot_retry(samples, 1.0, lambda: pytest.fail("ran"))
    assert (extra, hot) == (0, False)


def test_hot_retry_tiny_rows_need_absolute_slack():
    # 3x a 0.05 s reference is only +0.10 s — inside HOT_ABS_SLACK,
    # so sub-second noise does not trigger retries
    samples = [0.15]
    extra, hot = bench.hot_retry(samples, 0.05, lambda: pytest.fail("ran"))
    assert (extra, hot) == (0, False)


def test_hot_retry_burst_recovers_and_clears_flag():
    # base trials hot (3x), first retry lands back at the reference:
    # gate clears, row is NOT contaminated, stat tightened to 1.0
    samples = [3.0, 3.1]
    extra, hot = bench.hot_retry(samples, 1.0, iter([1.0]).__next__)
    assert (extra, hot) == (1, False)
    assert min(samples) == 1.0


def test_hot_retry_stable_slowdown_converges_and_flags():
    # retries agree within 10% of each other but stay >1.5x ref:
    # stop early (converged), flag contaminated
    feed = iter([2.9, 2.95])
    samples = [3.0]
    extra, hot = bench.hot_retry(samples, 1.0, feed.__next__)
    assert extra == 2  # stopped at first consecutive-agreement, not max
    assert hot is True


def test_hot_retry_is_bounded():
    # never converging and never clearing: hard cap at MAX_EXTRA_TRIALS
    calls = []

    def wild():
        # alternate far apart so no two consecutive samples agree
        calls.append(1)
        return 10.0 if len(calls) % 2 else 20.0

    samples = [10.0]
    extra, hot = bench.hot_retry(samples, 1.0, wild)
    assert extra == bench.MAX_EXTRA_TRIALS == len(calls)
    assert hot is True


def test_bench_end_to_end_with_reference(tmp_path):
    """r13 regression (VERDICT r13 task #2): run bench.py's REAL main()
    over a tiny selection with a populated committed reference, so the
    ref_min/ref_ratio/hot-retry bookkeeping — which only executes `if
    ref is not None` — actually runs. The r13 driver capture crashed on
    a NameError in exactly this block (bench.py:644, `ordered` leftover
    from the 7a67da1 rename) while all 11 mechanics tests stayed green,
    because nothing drove the per-row loop end-to-end with a reference
    present. bench.py is copied to tmp so the fabricated reference and
    the run's BENCH_DETAIL_subset.json never touch the committed
    captures."""
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_copy = tmp_path / "bench.py"
    shutil.copy(os.path.join(repo, "bench.py"), bench_copy)
    rows = ["knn_top5_full", "tpch_q1_pricing"]
    # generous ref for one row (ref_ratio path, no retry) and a tiny
    # ref for the other (forces the hot_retry extra-trial path in situ)
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({
            "sf": 0.001,
            "queries_min": {rows[0]: 999.0, rows[1]: 0.0001},
        })
    )
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_SETTLE_SEC="0",
        SPARK_GRAFT_BENCH_ONLY=",".join(rows),
        PYTHONPATH=repo,
    )
    proc = subprocess.run(
        [sys.executable, str(bench_copy)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # contract: stdout's last non-empty line is ONE compact JSON record
    line = [l for l in proc.stdout.splitlines() if l.strip()][-1]
    assert len(line) <= 2000
    compact = json.loads(line)
    assert compact["metric"] == "headline_query_wall_time_total"
    assert set(compact["queries"]) == set(rows)
    assert compact["value"] > 0
    detail = json.loads((tmp_path / "BENCH_DETAIL_subset.json").read_text())
    for name in rows:
        row = detail["spread"][name]
        # the r13-crash block: both reference fields must be present
        # (ref_ratio is computed from the UNROUNDED min, so compare
        # against the recorded 3dp min with a tolerance)
        assert row["ref_min"] in (999.0, 0.0001)
        expected = row["min"] / row["ref_min"]
        assert abs(row["ref_ratio"] - expected) <= max(0.01, 0.02 * expected)
    # the tiny-ref row must have walked the retry path and been flagged
    hot_row = detail["spread"][rows[1]]
    assert hot_row["extra_trials"] >= 1
    assert hot_row["contaminated"] is True
    assert rows[1] in detail["contaminated_rows"]
