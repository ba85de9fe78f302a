"""Automated non-convergence gate (VERDICT r3 #6).

The r3 variance study showed a bad seed is train-loss-detectable (final
loss 0.00615 vs cohort median 0.00478, >20% above) — but the ">20% above
cohort median ⇒ re-seed" rule was manual protocol. These tests pin the two
automated forms: the runner's configured-threshold flag
(``convergence_loss_threshold``, written to ``<run_dir>/convergence.json``)
and the variance tool's cohort-median gate.
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from vf_nerf_tpu.config.schema import VFRunnerConfig  # noqa: E402
from vf_nerf_tpu.train.runner import VectorFieldNerfRunner  # noqa: E402


def _bare_runner(tmp_path, threshold, final_loss):
    """A runner shell with just the state _write_convergence_flag reads
    (building a full runner trains a model; the flag logic is pure)."""
    r = object.__new__(VectorFieldNerfRunner)
    r.config = object.__new__(VFRunnerConfig)
    r.config.convergence_loss_threshold = threshold
    r.final_loss = final_loss
    r.run_dir = str(tmp_path)
    return r


def _flag(tmp_path):
    with open(os.path.join(str(tmp_path), "convergence.json")) as f:
        return json.load(f)


class TestRunnerThresholdGate:
    def test_flags_above_threshold(self, tmp_path, capsys):
        _bare_runner(tmp_path, 0.005, 0.00615)._write_convergence_flag()
        out = _flag(tmp_path)
        assert out["flagged"] is True
        assert out["final_loss"] == 0.00615
        assert out["threshold"] == 0.005
        assert "re-run" in out["recommendation"] or \
               "re-seed" in out["recommendation"]
        assert "re-seeding" in capsys.readouterr().out

    def test_passes_below_threshold(self, tmp_path, capsys):
        _bare_runner(tmp_path, 0.005, 0.00478)._write_convergence_flag()
        out = _flag(tmp_path)
        assert out["flagged"] is False
        assert "recommendation" not in out
        assert "WARNING" not in capsys.readouterr().out

    def test_disabled_by_default_but_always_written(self, tmp_path):
        _bare_runner(tmp_path, 0.0, 0.9)._write_convergence_flag()
        out = _flag(tmp_path)
        assert out == {"final_loss": 0.9, "diverged": False,
                       "threshold": None, "flagged": False}

    def test_no_loss_recorded(self, tmp_path):
        _bare_runner(tmp_path, 0.005, None)._write_convergence_flag()
        assert _flag(tmp_path)["flagged"] is False

    def test_diverged_nan_flags_even_without_threshold(self, tmp_path,
                                                       capsys):
        """A NaN final loss is flagged regardless of threshold and is
        serialized as null (strict-JSON safe)."""
        _bare_runner(tmp_path, 0.0, float("nan"))._write_convergence_flag()
        out = _flag(tmp_path)
        assert out["diverged"] is True
        assert out["flagged"] is True
        assert out["final_loss"] is None
        assert "diverged" in out["recommendation"]
        assert "non-finite" in capsys.readouterr().out

    def test_diverged_inf_flags(self, tmp_path):
        _bare_runner(tmp_path, 0.005, float("inf"))._write_convergence_flag()
        out = _flag(tmp_path)
        assert out == {"final_loss": None, "diverged": True,
                       "threshold": 0.005, "flagged": True,
                       "recommendation": out["recommendation"]}


class TestCohortGate:
    def test_flags_outlier_seed(self, capsys):
        from convergence_variance import apply_cohort_gate

        # The r3 variance-study numbers: seed 2 is the 28%-above outlier.
        runs = [{"seed": 42, "final_loss": 0.00478},
                {"seed": 1, "final_loss": 0.00466},
                {"seed": 2, "final_loss": 0.00615},
                {"seed": 3, "final_loss": 0.00481},
                {"seed": 7, "final_loss": 0.00472}]
        agg = apply_cohort_gate(runs)
        assert agg["flagged_seeds"] == [2]
        assert [r["flagged"] for r in runs] == [False, False, True, False,
                                                False]
        assert agg["cohort_median_loss"] == 0.00478
        assert "re-seeding" in capsys.readouterr().out

    def test_no_flags_in_tight_cohort(self):
        from convergence_variance import apply_cohort_gate

        runs = [{"seed": s, "final_loss": 0.005 + 1e-5 * s}
                for s in range(5)]
        agg = apply_cohort_gate(runs)
        assert agg["flagged_seeds"] == []

    def test_missing_losses_tolerated(self):
        from convergence_variance import apply_cohort_gate

        runs = [{"seed": 0, "final_loss": None}, {"seed": 1, "error": True},
                {"seed": 2, "final_loss": 0.005}]
        agg = apply_cohort_gate(runs)
        assert agg["flagged_seeds"] == []
        assert runs[0]["flagged"] is False

    def test_all_diverged_cohort_still_flags(self, capsys):
        """With no finite losses there is no cohort median, but divergence
        is self-evident: every loss-bearing run must be flagged instead of
        silently disabling the gate (ADVICE r4)."""
        from convergence_variance import apply_cohort_gate

        runs = [{"seed": 0, "final_loss": float("nan")},
                {"seed": 1, "final_loss": float("inf")},
                {"seed": 2, "error": True}]
        agg = apply_cohort_gate(runs)
        assert agg["flagged_seeds"] == [0, 1]
        assert agg["cohort_median_loss"] is None
        assert [r["flagged"] for r in runs] == [True, True, False]
        assert "diverged" in capsys.readouterr().out
