"""Measured benchmark of the native (C++) host data pipeline vs the
pure-NumPy fallbacks (VERDICT r2 item 10: the native layer must carry
a number or be deleted).

Builds the .so if missing, generates a synthetic multi-track GPS CSV,
and times, best-of-3:
  - read_csv           (native tokenizer+factor-coder vs numpy loop)
  - pack_tracks        (native segment+pad packer vs python loop)
  - cr_design          (native banded cr-basis eval vs numpy)

Appends one JSON line to tools/native_pipeline.jsonl.
Usage: python tools/native_pipeline_bench.py [n_rows]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from smoothsde_tpu.utils import native  # noqa: E402

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


def best_of(fn, reps=3):
    best = np.inf
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not native.native_available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=True)
        native.reset()
    assert native.native_available(), "native build failed"

    rng = np.random.default_rng(0)
    n_tracks = 64
    ids = np.sort(rng.integers(0, n_tracks, n))
    times = np.cumsum(rng.uniform(0.3, 0.7, n))
    xy = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)

    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False
    ) as f:
        path = f.name
        f.write("ID,time,x,y\n")
        np.savetxt(
            f,
            np.column_stack([ids, times, xy[:, 0], xy[:, 1]]),
            fmt=["a%d", "%.6f", "%.6f", "%.6f"],
            delimiter=",",
        )
    try:
        t_nat, out_nat = best_of(lambda: native.read_csv(path))
        t_np, out_np = best_of(
            lambda: native._read_csv_numpy(path, ",", "ID")
        )
        for k in ("time", "x", "y"):
            assert np.allclose(out_nat[k], out_np[k], equal_nan=True)

        codes = out_nat["__ID_codes__"]
        obs = np.column_stack([out_nat["x"], out_nat["y"]])
        tt = out_nat["time"]

        t_pack_nat, packed = best_of(
            lambda: native.pack_tracks_native(obs, tt, codes)
        )

        def pack_py():
            from smoothsde_tpu.parallel.dist import pack_layout

            return pack_layout(tt, codes, n_devices=1, pad_multiple=128)

        t_pack_py, _ = best_of(pack_py)

        x = rng.uniform(size=n)
        # values-at-knots cr parameterization (formula/smooths.py CR
        # construction: banded B/D, natural boundary conditions)
        k = 10
        knots = np.quantile(x, np.linspace(0, 1, k))
        h = np.diff(knots)
        B = np.zeros((k - 2, k - 2))
        D = np.zeros((k - 2, k))
        for i in range(k - 2):
            D[i, i] = 1.0 / h[i]
            D[i, i + 1] = -1.0 / h[i] - 1.0 / h[i + 1]
            D[i, i + 2] = 1.0 / h[i + 1]
            B[i, i] = (h[i] + h[i + 1]) / 3.0
            if i < k - 3:
                B[i, i + 1] = h[i + 1] / 6.0
                B[i + 1, i] = h[i + 1] / 6.0
        F = np.vstack([np.zeros(k), np.linalg.solve(B, D), np.zeros(k)])
        t_cr_nat, D1 = best_of(lambda: native.cr_design_native(x, knots, F))
        from smoothsde_tpu.formula.smooths import _cr_design

        t_cr_np, D2 = best_of(lambda: _cr_design(x, knots, F))
        assert np.allclose(D1, D2, atol=1e-10)

        row = {
            "n_rows": n,
            "csv_native_s": round(t_nat, 3),
            "csv_numpy_s": round(t_np, 3),
            "csv_speedup": round(t_np / t_nat, 2),
            "pack_native_s": round(t_pack_nat, 4),
            "pack_python_s": round(t_pack_py, 4),
            "pack_speedup": round(t_pack_py / t_pack_nat, 2),
            "cr_design_native_s": round(t_cr_nat, 4),
            "cr_design_numpy_s": round(t_cr_np, 4),
            "cr_design_speedup": round(t_cr_np / t_cr_nat, 2),
        }
        print(json.dumps(row), flush=True)
        with open("tools/native_pipeline.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
