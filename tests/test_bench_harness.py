"""Driver-proofing tests for bench.py's section harness (VERDICT r4 #1/#7).

These cover the orchestration plumbing only (no TPU, no model compiles):
* every completed section re-prints a full parseable record line, so a
  bench killed at ANY point leaves a parseable headline on stdout;
* a failing/timed-out section degrades to a ``sections_failed`` key;
* the self-regression sentinel diffs the newest prior BENCH_r*.json.
"""

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_last_json_line(bench):
    text = "noise\n{\"a\": 1}\nwarmup done\n{\"a\": 2, \"b\": 3}\ntrailing"
    assert bench._parse_last_json_line(text) == {"a": 2, "b": 3}
    assert bench._parse_last_json_line("no json here\n[1,2]") is None
    assert bench._parse_last_json_line("{broken\n{\"ok\": true}") == {"ok": True}


def test_latest_prior_bench_picks_newest_parsed(bench, tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"parsed": {"value": 100.0}}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"value": 300.0}}))
    # Newest round has parsed: null (the r04 failure shape) -> skipped.
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"parsed": None, "rc": 124}))
    rnd, prev = bench._latest_prior_bench(str(tmp_path))
    assert rnd == 3 and prev == {"value": 300.0}


def test_latest_prior_bench_none(bench, tmp_path):
    rnd, prev = bench._latest_prior_bench(str(tmp_path))
    assert prev is None


def test_regression_flags(bench):
    prev = {"value": 300.0, "mfu": 0.44,
            "stage1_eval_images_per_sec_per_chip": 1000.0,
            "loader_warm_images_per_sec_per_chip": 20.0}
    cur = {"value": 310.0,  # improved: no flag
           "mfu": 0.40,     # -9%: flagged
           "stage1_eval_images_per_sec_per_chip": 985.0,  # -1.5%: within noise
           "loader_warm_images_per_sec_per_chip": 8.0}  # tunnel-bound: excluded
    flags = bench._regression_flags(cur, prev)
    assert set(flags) == {"mfu"}
    assert flags["mfu"]["prev"] == 0.44
    assert flags["mfu"]["delta_pct"] < -3.0


def _run_orchestrator(bench, monkeypatch, capsys, tmp_path, section_fns,
                      argv=("bench.py", "--in-process")):
    monkeypatch.setattr(bench, "_SECTION_FNS", section_fns)
    monkeypatch.setattr(bench, "_SECTION_PLAN",
                        tuple((name, 60) for name in section_fns))
    monkeypatch.setattr(bench, "_apply_cache_config", lambda: None)
    orig_latest = bench._latest_prior_bench
    monkeypatch.setattr(bench, "_latest_prior_bench",
                        lambda _repo: orig_latest(str(tmp_path)))
    monkeypatch.setattr(sys, "argv", list(argv))
    assert bench.main() == 0
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.strip().startswith("{")]
    return lines


def test_incremental_emission_and_failure_degradation(
        bench, monkeypatch, capsys, tmp_path):
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"value": 300.0, "mfu": 0.44}}))

    def boom():
        raise RuntimeError("wedged compile stand-in")

    fns = {
        "stage3_train": lambda: {"value": 305.0, "mfu": 0.45},
        "loader": boom,
        "stage1_eval": lambda: {"stage1_eval_images_per_sec_per_chip": 1050.0},
    }
    lines = _run_orchestrator(bench, monkeypatch, capsys, tmp_path, fns)
    # One full record line per section: kill the bench after any of them and
    # the last stdout line is still a parseable headline record.
    assert len(lines) == 3
    assert lines[0]["value"] == 305.0
    assert lines[0]["vs_baseline"] == pytest.approx(305.0 / 12.0, abs=0.01)
    # Section 2 failed -> degraded to a key, headline intact.
    assert "loader" in lines[1]["sections_failed"]
    assert lines[1]["value"] == 305.0
    # Final record carries everything + the sentinel vs round 3.
    final = lines[-1]
    assert final["stage1_eval_images_per_sec_per_chip"] == 1050.0
    assert final["regression_vs_prev"] == {}  # 305 > 300, 0.45 > 0.44
    assert final["regression_vs_prev_round"] == 3


def test_regression_sentinel_fires_in_record(bench, monkeypatch, capsys, tmp_path):
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"value": 300.0}}))
    fns = {"stage3_train": lambda: {"value": 200.0}}
    lines = _run_orchestrator(bench, monkeypatch, capsys, tmp_path, fns)
    assert lines[-1]["regression_vs_prev"]["value"]["delta_pct"] == pytest.approx(
        -33.3, abs=0.1)


def test_subprocess_timeout_degrades(bench, monkeypatch, capsys, tmp_path):
    """A section subprocess that never returns is killed at its bound and
    recorded as failed; the run continues (the BENCH_r04 failure mode)."""
    import subprocess

    calls = []

    def fake_run(cmd, **kwargs):
        name = cmd[cmd.index("--section") + 1]
        calls.append(name)
        if name == "stage3_train":
            raise subprocess.TimeoutExpired(cmd, kwargs.get("timeout"))
        return subprocess.CompletedProcess(
            cmd, 0, stdout=json.dumps(
                {"stage1_eval_images_per_sec_per_chip": 1000.0}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_SECTION_FNS",
                        {"stage3_train": None, "stage1_eval": None})
    monkeypatch.setattr(bench, "_SECTION_PLAN",
                        (("stage3_train", 1), ("stage1_eval", 1)))
    monkeypatch.setattr(bench, "_apply_cache_config", lambda: None)
    monkeypatch.setattr(bench, "_latest_prior_bench", lambda _repo: (None, None))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench.main() == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    assert calls == ["stage3_train", "stage1_eval"]
    final = lines[-1]
    assert final["value"] is None
    assert "timeout" in final["sections_failed"]["stage3_train"]
    assert final["stage1_eval_images_per_sec_per_chip"] == 1000.0


def test_early_stage_headline_lifts_prefixed_keys(
        bench, monkeypatch, capsys, tmp_path):
    """A --stage 2 headline run reports stage-prefixed keys from the worker;
    the orchestrator lifts value/mfu AND the TFLOP evidence behind them."""
    fns = {"stage2_train": lambda: {
        "stage2_train_images_per_sec_per_chip": 320.0,
        "stage2_mfu": 0.45,
        "stage2_achieved_tflops_per_sec_per_chip": 88.0,
        "stage2_tflops_per_image": 0.27,
        "stage2_n_chips": 1,
        "stage2_peak_tflops": 197.0,
    }}
    lines = _run_orchestrator(
        bench, monkeypatch, capsys, tmp_path, fns,
        argv=("bench.py", "--in-process", "--stage", "2", "--skip-extras"))
    final = lines[-1]
    assert final["metric"] == "stage2_train_images_per_sec_per_chip"
    assert final["value"] == 320.0
    assert final["mfu"] == 0.45
    assert final["achieved_tflops_per_sec_per_chip"] == 88.0
    assert final["n_chips"] == 1 and final["peak_tflops"] == 197.0
    assert "stage2_mfu" not in final
