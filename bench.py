"""Benchmark: render throughput (rays/sec) on one TPU chip.

Workload = the reference's headline render configuration (BASELINE.md):
1024-ray chunks, 100 coarse + 30 fine samples/ray, full 256-wide VF +
rendering nets, eval mode (perturb off). Prints ONE JSON line; ``vs_baseline``
compares against the measured reference throughput in
``BASELINE_MEASURED.json`` (reference-on-host-CPU — the only environment the
torch reference can run in here; see that file's note).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
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

    keys = [jax.random.PRNGKey(i) for i in range(100)]

    def run(key):
        return jitted(*args[:-1], key)

    float(run(keys[0]))  # warmup / compile / sync

    n_rays = args[1].shape[0]
    n_iters = 33
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
        "metric": f"render rays/sec/chip (1024-ray chunks, 100+30 samples, "
                  f"{device})",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
