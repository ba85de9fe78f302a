"""Retry path of bench.py's relay-resilient supervisor.

Round-3 postmortem: a transient axon-relay outage (backend init raising
UNAVAILABLE, or hanging outright) cost the round its headline metric because
bench.py made one attempt and died with a raw traceback. These tests drive
``bench.supervise`` with mock attempts simulating exactly those failure
modes — including a killed-mid-run (timeout) relay — and pin the contract:
bounded retries with backoff, and on final failure ONE well-formed JSON
payload with an ``error`` field instead of a traceback.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_recovers_after_transient_unavailable():
    """Two UNAVAILABLE backend-init failures, then success."""
    calls = []
    sleeps = []

    def attempt():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE")
        return {"metric": "m", "value": 288000.0, "unit": "rays/sec",
                "vs_baseline": 3000.0}

    out = bench.supervise(attempt, attempts=3, backoffs=(0.01, 0.02),
                          sleep=sleeps.append)
    assert out["value"] == 288000.0
    assert "error" not in out
    assert len(calls) == 3
    assert sleeps == [0.01, 0.02]  # backoff before each retry


def test_killed_mid_run_relay_yields_error_json():
    """Relay hangs every attempt (subprocess killed by timeout): the
    supervisor must emit a structured error payload, not raise."""

    def attempt():
        raise subprocess.TimeoutExpired(cmd="bench worker", timeout=600)

    out = bench.supervise(attempt, attempts=3, backoffs=(0.0,),
                          sleep=lambda _: None)
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert "TimeoutExpired" in out["error"]
    assert out["error"].count("attempt") == 3
    # The driver records this verbatim — it must be one JSON-serializable
    # line with the same schema as the success payload.
    line = json.dumps(out)
    parsed = json.loads(line)
    assert set(parsed) >= {"metric", "value", "unit", "vs_baseline", "error"}
    assert "\n" not in line


def test_success_first_try_no_sleep():
    sleeps = []
    out = bench.supervise(lambda: {"value": 1.0}, attempts=3,
                          backoffs=(1.0,), sleep=sleeps.append)
    assert out == {"value": 1.0}
    assert sleeps == []


def test_error_message_bounded():
    """A relay traceback repeated across attempts must not blow up the
    JSON line (the driver stores it)."""

    def attempt():
        raise RuntimeError("X" * 10_000)

    out = bench.supervise(attempt, attempts=3, backoffs=(0.0,),
                          sleep=lambda _: None)
    assert len(out["error"]) <= 2000


def test_subprocess_attempt_surfaces_worker_stderr(tmp_path, monkeypatch):
    """End-to-end through a real subprocess: a crashing worker's stderr tail
    reaches the supervisor's error summary."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text(
        "import sys\n"
        "if '--worker' in sys.argv:\n"
        "    sys.stderr.write('jaxlib.xla_extension.XlaRuntimeError: "
        "UNAVAILABLE: relay down\\n')\n"
        "    sys.exit(1)\n"
    )
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(fake))
    with pytest.raises(RuntimeError, match="UNAVAILABLE: relay down"):
        bench._subprocess_attempt()
