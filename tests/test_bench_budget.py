"""bench.py budget machinery.

BENCH_r04 was lost to an outer-timeout kill (rc 124, nothing printed):
these tests pin the defenses — remaining-budget caps on mode
subprocesses, skip-when-exhausted, and the single-shot partial emit that
SIGTERM triggers. bench.py's module-level imports are light (no jax), so
this suite is cheap.
"""

import json
import time

import bench


def _set_budget(monkeypatch, remaining: float):
    monkeypatch.setattr(bench, "_BUDGET", remaining)
    monkeypatch.setattr(bench, "_T0", time.monotonic())


def test_run_mode_skips_when_budget_exhausted(monkeypatch, capsys):
    _set_budget(monkeypatch, 50)          # under the 60 s floor
    out = bench._run_mode("print('RESULT={{}}')")
    assert out is None
    assert "budget exhausted" in capsys.readouterr().err


def test_run_mode_caps_timeout_by_remaining(monkeypatch):
    _set_budget(monkeypatch, 200)
    seen = {}

    def fake_run(cmd, capture_output, text, timeout):
        seen["timeout"] = timeout

        class P:
            stdout = 'RESULT={"qps": 1.0}'
            stderr = ""

        return P()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._run_mode("ignored", timeout=2400)
    assert out == {"qps": 1.0}
    # capped to remaining - 30, not the 2400 the mode asked for
    assert seen["timeout"] <= 170


def test_emit_is_single_shot_and_headline_falls_back(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_EMITTED", False)
    out = {"metric": "questions_per_sec", "device_qps": 100.0}
    bench._emit(out, baseline=0.25)
    bench._emit(out, baseline=0.25)       # second call must not print
    lines = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    # no e2e measured: device_qps is the headline
    assert parsed["value"] == 100.0
    assert parsed["vs_baseline"] == 400.0


def test_emit_prefers_e2e_headline(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_EMITTED", False)
    out = {"device_qps": 100.0, "e2e_qps": 80.0}
    bench._emit(out, baseline=None)
    parsed = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert parsed["value"] == 80.0
    assert parsed["vs_baseline"] is None
