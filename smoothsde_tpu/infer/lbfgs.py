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
buffer of m (s, y) pairs, gamma scaling) with a branch-free fixed-grid
backtracking line search (the candidates are evaluated with lax.map —
the Laplace marginal contains an inner while_loop, which vmap cannot
batch but sequential map handles fine; candidate count is small).
Curvature pairs are accepted only when s'y > 0 (damped skip), keeping
the inverse-Hessian approximation SPD.

Convergence: scale-aware gradient tolerance (matching infer/fit.py's
criterion) plus a no-progress stop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_ALPHAS = (
    1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 1e-3, 3e-4, 1e-4, 0.0
)


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
        gtol_rel = 1e-3 if dtype == jnp.float32 else 1e-6
    alphas = jnp.asarray(_ALPHAS, dtype)

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

        cand = st.x[None, :] + alphas[:, None] * d[None, :]

        def eval_cand(xc):
            v, g, b = vg(xc, st.b)
            return v, g, b

        fs, gs, bs = jax.lax.map(eval_cand, cand)
        # Armijo sufficient decrease; fall back to plain argmin
        suff = fs <= st.f + 1e-4 * alphas * dg
        fs_arm = jnp.where(suff, fs, jnp.inf)
        k_best = jnp.where(
            jnp.any(suff), jnp.argmin(fs_arm), jnp.argmin(fs)
        )
        # one parabolic refinement around the best grid point: the
        # quadratic through (0, f), (a, f_a), (2a, f_2a-from-grid or a
        # second probe) — here use the exact directional model
        # f(t) ~ f + t*dg + c t^2 fitted at t = a_best, minimized at
        # t* = -dg a^2 / (2 (f_a - f - dg a)); grid coarseness between
        # neighbors otherwise caps the per-iteration decrease.
        a_b = alphas[k_best]
        f_b = fs[k_best]
        denom = 2.0 * (f_b - st.f - dg * a_b)
        t_star = jnp.where(
            (denom > 0) & (a_b > 0),
            -dg * a_b * a_b / denom,
            a_b,
        )
        t_star = jnp.clip(t_star, 0.0, 2.0 * jnp.max(alphas))
        f_r, g_r, b_r = vg(st.x + t_star * d, st.b)
        use_r = f_r < f_b
        x_new = jnp.where(use_r, st.x + t_star * d, cand[k_best])
        f_new = jnp.where(use_r, f_r, f_b)
        g_new = jnp.where(use_r, g_r, gs[k_best])
        b_new = jax.tree.map(
            lambda rr, kk: jnp.where(use_r, rr, kk[k_best]), b_r, bs
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
        return State(
            x=x_new, f=f_new, g=g_new, b=b_new, S=S, Y=Y, rho=rho,
            head=head, k=st.k + 1, evals=st.evals + len(_ALPHAS) + 1,
            progress=st.f - f_new,
        )

    def cond(st: State):
        eps_dec = 1e-12 if dtype == jnp.float64 else 1e-7
        return (
            (st.k < maxiter)
            & (jnp.max(jnp.abs(st.g)) > gtol(st.f))
            & (st.progress > eps_dec * (1.0 + jnp.abs(st.f)))
        )

    f0, g0, b0_new = vg(x0, b0)
    init = State(
        x=x0, f=f0, g=g0, b=b0_new,
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), head=jnp.asarray(0),
        k=jnp.asarray(0), evals=jnp.asarray(1),
        progress=jnp.asarray(jnp.inf, dtype),
    )
    st = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g, b=st.b, n_iter=st.k,
        n_evals=st.evals,
        converged=jnp.max(jnp.abs(st.g)) <= gtol(st.f),
    )
