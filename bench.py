"""Benchmark: render throughput (rays/sec) on one TPU chip.

Workload = the reference's headline render configuration (BASELINE.md):
1024-ray chunks, 100 coarse + 30 fine samples/ray, full 256-wide VF +
rendering nets, eval mode (perturb off). Prints ONE JSON line; ``vs_baseline``
compares against the measured reference throughput in
``BASELINE_MEASURED.json`` (reference-on-host-CPU — the only environment the
torch reference can run in here; see that file's note).

Relay resilience: the axon TPU relay occasionally drops (backend init raises
UNAVAILABLE) or hangs outright (>5 min in backend init — observed 2026-08-17,
cost round 3 its metric). The measurement therefore runs in a *subprocess*
with a hard timeout, supervised by ``supervise()``: bounded retries with
backoff, and on final failure ONE JSON line with an ``"error"`` field instead
of a traceback.  ``supervise`` is a pure function so tests can drive the
retry path with a mock attempt (tests/test_bench_retry.py).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

METRIC = "render rays/sec/chip (1024-ray chunks, 100+30 samples"

ATTEMPTS = int(os.environ.get("VFNERF_BENCH_ATTEMPTS", "3"))
# First remote compile of the render graph is 1-4 min; warm runs finish in
# seconds. But under a degraded relay, backend *init* alone was measured at
# 489 s (2026-08-19) while the chip still worked fine afterwards — a 600 s
# cap would have failed every attempt of a recoverable run. 1500 s bounds a
# degraded-but-healthy attempt; a truly hung relay still gets cut off well
# inside the round (3 attempts ≈ 77 min worst case).
TIMEOUT_S = float(os.environ.get("VFNERF_BENCH_TIMEOUT", "1500"))
BACKOFFS_S = (20.0, 60.0)  # sleep before retry 2, retry 3, ...


def supervise(attempt, attempts=ATTEMPTS, backoffs=BACKOFFS_S, sleep=time.sleep):
    """Run ``attempt()`` up to ``attempts`` times; return its result dict.

    ``attempt`` returns the result payload (dict) on success and raises on
    failure (any exception — relay UNAVAILABLE, subprocess timeout, nonzero
    exit). On final failure returns an error payload with the same ``metric``
    / ``unit`` keys so the driver still records one well-formed JSON line.
    """
    errors = []
    for i in range(attempts):
        if i > 0:
            sleep(backoffs[min(i - 1, len(backoffs) - 1)])
        try:
            return attempt()
        except Exception as exc:  # noqa: BLE001 — every failure mode retries
            errors.append(f"attempt {i + 1}: {type(exc).__name__}: {exc}")
    return {
        "metric": METRIC + ")",
        "value": None,
        "unit": "rays/sec",
        "vs_baseline": None,
        "error": "; ".join(errors)[-2000:],
    }


def _subprocess_attempt():
    """One measurement attempt in a fresh interpreter with a hard timeout.

    A fresh process is the only reliable retry unit: a hung axon backend
    init cannot be cancelled in-process, and a failed init poisons the
    process-wide JAX backend state.
    """
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        capture_output=True,
        text=True,
        timeout=TIMEOUT_S,
        cwd=REPO,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
        raise RuntimeError(f"worker rc={proc.returncode}: " + " | ".join(tail))
    # Last stdout line is the worker's JSON payload.
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def worker() -> None:
    """The actual measurement (runs in the supervised subprocess)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()

    # NOTE: on this image's axon TPU relay, block_until_ready returns before
    # device execution finishes — a scalar reduction fetched to host is the
    # only reliable sync, and it also forces every ray's computation (no
    # batch-narrowing DCE).
    def reduced(*a):
        rgb, depth = fn(*a)
        return jnp.sum(rgb) + jnp.sum(depth)

    jitted = jax.jit(reduced)

    keys = [jax.random.PRNGKey(i) for i in range(1000)]

    def run(key):
        return jitted(*args[:-1], key)

    float(run(keys[0]))  # warmup / compile / sync

    n_rays = args[1].shape[0]
    # 300 dispatches/trial: the trial's single hard sync (a host fetch
    # through the relay, ~0.1-0.5 s) is a FIXED cost — at 33 iters it ate
    # ~20% of the measured rate (262k vs 330k rays/s, r4); 300 amortizes
    # it below the trial-to-trial noise while keeping a trial ~3 s.
    n_iters = 300
    # Median of 3 trials: single-trial numbers swing ±5% with transient
    # relay load; the median is reproducible run to run.
    rates = []
    for t in range(3):
        start = time.perf_counter()
        for i in range(n_iters):
            out = run(keys[t * n_iters + i + 1])
        float(out)  # hard sync via host fetch
        elapsed = time.perf_counter() - start
        rates.append(n_rays * n_iters / elapsed)
    rays_per_sec = sorted(rates)[1]

    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["reference_rays_per_sec"]
        vs_baseline = rays_per_sec / baseline

    device = str(jax.devices()[0])
    print(json.dumps({
        "metric": f"{METRIC}, {device})",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    print(json.dumps(supervise(_subprocess_attempt)))


if __name__ == "__main__":
    main()
