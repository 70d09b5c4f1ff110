"""In-process refit benchmark: repeated `SDE.fit` of the 1M-step
configs through the public API.

The reference's own workflow fits a model many times in one session
(simulation-recovery studies, inst/driver.R:63-79; model comparison).
Cross-process warm fits are floored by the per-process executable
reload through the remote-TPU tunnel (~4 s for the ~40 MB 1M-step
executables); within a process the aot_cached memo (utils/cache.py)
keeps the loaded executable, so every fit after the first costs the
actual device dispatch.

Appends a JSON line to tools/bench_refit.jsonl.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main():
    import jax

    import bench_configs as bc

    cfg = sys.argv[1] if len(sys.argv) > 1 else "5a"
    builders = {"5a": bc.config5_ctcrw, "5b": bc.config5_cir}
    sde, truth = builders[cfg]()

    t0 = time.perf_counter()
    res = sde.fit(optimizer="auto")
    first = time.perf_counter() - t0

    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = sde.fit(optimizer="auto")
        walls.append(time.perf_counter() - t0)
        assert abs(r.value - res.value) < 1e-3 * (1 + abs(res.value))

    out = {
        "metric": f"in_process_refit_{cfg}",
        "backend": jax.default_backend(),
        "n_obs": sde.n_obs(),
        "first_fit_s": round(first, 2),
        "refit_s_median": round(float(np.median(walls)), 3),
        "refit_s_all": [round(w, 3) for w in walls],
        "nllk": round(res.value, 3),
        "converged": res.convergence == 0,
        "convergence_via": res.convergence_via,
        "n_evals": res.counts,
    }
    print(json.dumps(out), flush=True)
    with open("/root/repo/tools/bench_refit.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
