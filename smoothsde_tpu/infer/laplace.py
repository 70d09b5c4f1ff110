"""Laplace approximation over smooth/random-effect coefficients.

Replaces TMB's MakeADFun(random = "coeff_re") machinery
(R/sde.R:656-658): the marginal nllk over outer parameters theta is

    marg(theta) = joint(theta, bhat) + 1/2 log det H_bb(theta, bhat)
                  - k/2 log(2 pi),
    bhat(theta) = argmin_b joint(theta, b),

with bhat computed by a damped Newton solver (lax.while_loop, fixed
multi-step-size line search evaluated with vmap — branch-free, TPU
friendly) and differentiated via the implicit function theorem
(custom_vjp: d bhat/d theta = -H_bb^{-1} d^2 joint / db dtheta), so
jax.grad(marg) is the exact gradient of the Laplace objective,
including the curvature (log-det) terms — the same quantity TMB's tape
produces.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LaplaceConfig(NamedTuple):
    max_iter: int = 100
    tol: float = 1e-8
    ridge: float = 1e-9


# 0.0 included: when every step size increases the objective (or lands
# on non-finite values), the iterate stays put instead of argmin
# picking an arbitrary bad candidate.
_ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.0)


def make_laplace(
    joint_nllk: Callable,
    packer,
    config: LaplaceConfig = LaplaceConfig(),
    joint_nllk_ad: Optional[Callable] = None,
    hess_plan: Optional[dict] = None,
):
    """Build (marginal_nllk, bhat_solver) for a packed objective.

    marginal_nllk(outer, b0) -> (value, bhat): differentiable in outer;
    b0 is a warm start (treated as constant under differentiation).

    `joint_nllk_ad`, when given, is a mathematically identical objective
    built from plain jax ops; every second-order quantity (the inner
    Newton Hessian, the log-det curvature term and its gradient, the
    implicit-diff cross derivatives) is routed through it, while the
    marginal *value* term uses `joint_nllk`. This lets the primary
    objective carry a reverse-only custom_vjp (fused Pallas filter +
    Fisher-identity smoother gradient) and still serve random-effects
    (Laplace) fits — the TMB random="coeff_re" equivalent
    (R/sde.R:656-658) at full TPU speed.
    """
    n_inner = packer.n_inner
    if n_inner == 0:
        def marginal_trivial(outer, b0):
            return joint_nllk(packer.unpack(outer)), jnp.zeros((0,))

        return marginal_trivial

    def f(outer, b):
        return joint_nllk(packer.unpack(outer, b))

    if joint_nllk_ad is None or joint_nllk_ad is joint_nllk:
        f_ad = f
    else:
        def f_ad(outer, b):
            return joint_nllk_ad(packer.unpack(outer, b))

    grad_b = jax.grad(f_ad, argnums=1)
    if hess_plan is not None:
        # compressed (colored) Hessian: one forward pass per color
        # instead of one per coefficient (infer/coloring.py) — exact
        # by construction, the plan builder rejects any structure it
        # cannot reconstruct.
        from smoothsde_tpu.infer.coloring import colored_hessian

        hess_b = colored_hessian(grad_b, hess_plan)
    else:
        hess_b = jax.jacfwd(grad_b, argnums=1)
    eye = jnp.eye(n_inner)
    alphas = jnp.asarray(_ALPHAS)

    def newton(outer, b0):
        f64 = jnp.result_type(b0) == jnp.float64
        # Absolute gradient tolerance, plus a scale-aware Newton
        # decrement criterion: g' H^-1 g has the units of the objective,
        # so comparing it against eps * (1 + |f|) stops as soon as the
        # achievable accuracy for the dtype is reached — in f32 a fixed
        # small gradient tolerance is often unreachable (gradient
        # roundoff grows with |f|) and the loop would always burn
        # max_iter iterations.
        tol = config.tol if f64 else 1e-4
        eps_dec = 1e-12 if f64 else 1e-6
        f0 = f_ad(outer, b0)
        dec_tol = eps_dec * (1.0 + jnp.abs(f0))

        def cond(state):
            b, g, i, f_cur, progress = state
            return (
                (i < config.max_iter)
                & (jnp.max(jnp.abs(g)) > tol)
                & (progress > dec_tol)
            )

        def body(state):
            b, g, i, f_cur, _ = state
            H = hess_b(outer, b)
            scale = jnp.mean(jnp.abs(jnp.diagonal(H))) + 1.0
            delta = jnp.linalg.solve(H + config.ridge * scale * eye, g)
            cand = b[None, :] - alphas[:, None] * delta[None, :]
            # f_ad here: the candidate sweep is vmapped, and the plain
            # jax path is always batchable (the fused-Pallas primary
            # need not be).
            fs = jax.vmap(lambda bb: f_ad(outer, bb))(cand)
            fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
            k = jnp.argmin(fs)
            b_new = cand[k]
            f_new = jnp.minimum(fs[k], f_cur)
            # Actual decrease achieved this iteration: when the line
            # search stalls (alpha = 0 wins, f32 noise floor reached),
            # stop instead of spinning to max_iter.
            progress = f_cur - f_new
            return (b_new, grad_b(outer, b_new), i + 1, f_new, progress)

        b, _, _, _, _ = jax.lax.while_loop(
            cond, body, (b0, grad_b(outer, b0), 0, f0, jnp.inf)
        )
        return b

    @jax.custom_vjp
    def bhat(outer, b0):
        return newton(outer, b0)

    def bhat_fwd(outer, b0):
        b = newton(outer, b0)
        return b, (outer, b)

    def bhat_bwd(res, v):
        outer, b = res
        H = hess_b(outer, b)
        w = jnp.linalg.solve(H, v)
        _, vjp_fn = jax.vjp(lambda o: grad_b(o, b), outer)
        (gout,) = vjp_fn(w)
        return (-gout, jnp.zeros_like(b))

    bhat.defvjp(bhat_fwd, bhat_bwd)

    log_2pi = jnp.log(2.0 * jnp.pi)

    def marginal_nllk(outer, b0):
        b = bhat(outer, b0)
        H = hess_b(outer, b)
        _, logdet = jnp.linalg.slogdet(H)
        val = f(outer, b) + 0.5 * logdet - 0.5 * n_inner * log_2pi
        return val, b

    return marginal_nllk
