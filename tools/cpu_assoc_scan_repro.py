"""Probe for the XLA:CPU reverse-AD-through-associative_scan
miscompilation that originally motivated the `local_scan='sequential'`
CPU workarounds in this repo (ops/kalman.default_filter_impl,
parallel/dist.py, parallel/time_scan.py).

STATUS (2026-08-19, jax 0.9.0 in this image): the miscompile does NOT
reproduce — 20/20 trials of this scalar-element probe and 5/5 trials of
the full 2x2 CTCRW element composition return the correct,
deterministic gradient (relerr ~2e-5 vs sequential in f32, i.e.
roundoff). The sequential-on-CPU default is RETAINED anyway because
XLA:CPU's gradient of associative_scan triggers its "Very slow compile"
path (~60s+ for this 4096-step toy vs ~2s sequential) — prohibitive for
the 8-virtual-device test mesh on one core — and because reverse-AD
work on CPU is not a production path (TPU is; its coverage lives in
tools/tpu_assoc_grad_check.py and tools/assoc_grad_check.jsonl).

Computes grad of a Kalman-style filtering-element associative scan on
the CPU backend per trial and compares against the sequential lax.scan
gradient (same math).

Usage: python tools/cpu_assoc_scan_repro.py [n_trials]
Prints one JSON line per mismatching trial and a summary; exit code 1
when any trial mismatches (i.e. the bug reproduces).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def combine(e1, e2):
    """Scalar-state Kalman filtering-element composition (the s=1 case
    of ops/kalman._combine; enough to trip the miscompile)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    M = 1.0 / (1.0 + C1 * J2)
    A2M = A2 * M
    return (
        A2M * A1,
        A2M * (b1 + C1 * eta2) + b2,
        A2M * C1 * A2 + C2,
        A1 * M * (eta2 - J2 * b1) + eta1,
        A1 * M * J2 * A1 + J1,
    )


def make_loss(scan_kind):
    def loss(theta, elems):
        A, b, C, eta, J = elems
        e = (A * theta, b + theta, C * jnp.exp(theta), eta, J)
        if scan_kind == "associative":
            out = jax.lax.associative_scan(combine, e, axis=0)
        else:
            def step(carry, x):
                new = combine(carry, x)
                return new, new

            init = tuple(
                jnp.asarray(v)
                for v in (1.0, 0.0, 0.0, 0.0, 0.0)
            )
            _, out = jax.lax.scan(step, init, e)
        return sum(jnp.sum(o) for o in out)

    return jax.jit(jax.grad(make_positive(loss)))


def make_positive(loss):
    return loss


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 4096
    rng = np.random.default_rng(0)
    elems = tuple(
        jnp.asarray(rng.uniform(0.1, 0.9, n)) for _ in range(5)
    )
    g_assoc = make_loss("associative")
    g_seq = make_loss("sequential")
    theta = jnp.asarray(0.3)

    ref = float(g_seq(theta, elems))
    bad = 0
    vals = []
    for t in range(n_trials):
        try:
            v = float(g_assoc(theta, elems))
        except Exception as e:  # crash counts as a failure
            v = float("nan")
            print(json.dumps({"trial": t, "error": repr(e)[:200]}))
        vals.append(v)
        ok = np.isfinite(v) and abs(v - ref) <= 1e-8 * (1 + abs(ref))
        if not ok:
            bad += 1
            print(json.dumps({"trial": t, "assoc": v, "seq": ref}))
    summary = {
        "backend": jax.default_backend(),
        "jax": jax.__version__,
        "n": n,
        "trials": n_trials,
        "mismatches": bad,
        "seq_grad": ref,
        "assoc_grads_unique": sorted(set(round(v, 10) for v in vals)),
    }
    print(json.dumps(summary))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
