"""Penalized joint negative log-likelihood assembly.

Equivalent of the reference's TMB data packing + templated objective
(R/sde.R:491-670 driving src/smoothSDE.cpp:9-28), built instead as a
pure JAX function over named parameter blocks:

    nllk(params) = -loglik(par_mat(params)) + penalty(coeff_re, lambda)

with par_mat the (n, n_par) working-scale linear predictor
(X_fe coeff_fe + X_re coeff_re, per-parameter blocks), the likelihood
either the vectorized transition-density sum or a Kalman filter, and
the smoothing penalty of ops/penalty.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from smoothsde_tpu.infer.params import ParamBlock, ParamPacker
from smoothsde_tpu.models.registry import ModelSpec
from smoothsde_tpu.models.ssm import (
    bm_ssm_steps,
    ctcrw_steps,
    eseal_ssm_steps,
    ou_ssm_steps,
)
from smoothsde_tpu.ops.densities import closed_form_loglik
from smoothsde_tpu.ops.kalman import kalman_loglik
from smoothsde_tpu.ops.penalty import make_penalty

_CLOSED_FORM = ("BM", "BM_t", "OU", "CIR")


def _dinvgamma_log(x, shape, scale):
    """Inverse-gamma log-pdf (nllk_e_seal_ssm.hpp:68-78)."""
    from jax.scipy.special import gammaln

    return shape * jnp.log(scale) - gammaln(shape) - (shape + 1.0) * jnp.log(
        x
    ) - scale / x


@dataclasses.dataclass
class ObjectiveBundle:
    """Everything the fitting layer needs.

    `joint_nllk` is the primary (fastest) objective; its gradient may
    come from a custom_vjp (fused Pallas + Fisher-identity smoother),
    which supports reverse mode only. `joint_nllk_ad` is mathematically
    identical but built from plain jax ops end to end, so every AD
    transform composes (jacfwd Hessians for the Laplace inner Newton,
    third-order for the log-det gradient, jax.hessian for the joint
    precision). They coincide when the primary path is already plain AD.
    """

    joint_nllk: Callable  # penalized, fn(full_params_dict) -> scalar
    joint_nllk_unpenalized: Callable  # include_penalty = 0 variant
    packer: ParamPacker
    par_matrix: Callable  # fn(full_params_dict) -> (n, n_par) working scale
    filter_states: Optional[Callable]  # SSMs: fn(full) -> (n, s) aest_all
    n_obs: int
    joint_nllk_ad: Optional[Callable] = None  # forward-mode-capable
    innovations: Optional[Callable] = None  # SSMs: fn(full) -> (u, F, ok)
    hess_plan: Optional[dict] = None  # colored inner-Hessian plan
    kind: str = ""  # 'closed_form' | 'ssm' (optimizer auto-selection)
    # content hash over (structure, data, options): key for the AOT
    # executable cache; None disables AOT caching for this bundle
    cache_token: Optional[str] = None
    # True when the likelihood closes over a jax.sharding.Mesh. Such
    # computations must NOT go through the jax.export AOT layer:
    # export pins the exporting device assignment and the replayed call
    # is only valid under an identical device context (the round-3
    # time-sharded-fit regression).
    uses_mesh: bool = False
    # Single-device forward-AD-capable twin for one-shot host-side
    # diagnostics (sdreport joint precision); equals joint_nllk_ad
    # when no mesh is involved.
    joint_nllk_ad_flat: Optional[Callable] = None

    def __post_init__(self):
        if self.joint_nllk_ad is None:
            self.joint_nllk_ad = self.joint_nllk
        if self.joint_nllk_ad_flat is None:
            self.joint_nllk_ad_flat = self.joint_nllk_ad


def _content_token(spec, design, obs, times, ids, other_data, fixpar,
                   init, map_fix, kalman_impl, mesh, mesh_axis, reml):
    """sha256 over the model structure, data, and options (host-side,
    before any device transfer). Two build_objective calls with equal
    tokens trace to identical computations."""
    import hashlib

    import jax

    h = hashlib.sha256()

    def _arr(x):
        x = np.ascontiguousarray(np.asarray(x))
        h.update(str(x.dtype).encode())
        h.update(str(x.shape).encode())
        h.update(x.tobytes())

    def _obj(o):
        if isinstance(o, dict):
            for k in sorted(o):
                h.update(str(k).encode())
                _obj(o[k])
        elif isinstance(o, (list, tuple)):
            for v in o:
                _obj(v)
        elif isinstance(o, np.ndarray):
            _arr(o)
        else:
            h.update(repr(o).encode())

    from smoothsde_tpu.utils.cache import source_digest

    # Code identity: any change to the package source (or schema bump)
    # invalidates serialized executables — without this, a warm AOT
    # cache would silently replay stale computations across installs.
    h.update(source_digest().encode())
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    h.update(b"x64" if jax.config.jax_enable_x64 else b"x32")
    _obj((spec.type, list(spec.param_names), spec.kind, fixpar,
          kalman_impl, mesh_axis, bool(reml)))
    if mesh is not None:
        _obj((tuple(mesh.axis_names), tuple(mesh.devices.shape),
              len(mesh.devices.flat)))
    _arr(obs)
    _arr(times)
    _arr(np.asarray(ids))
    for X in design.fe_blocks():
        _arr(X)
    for X in design.re_blocks():
        _arr(X)
    for S in design.S_blocks:
        _arr(S)
    _obj(other_data)
    _obj(init)
    _obj(map_fix)
    return h.hexdigest()[:32]


def build_objective(
    spec: ModelSpec,
    design,  # DesignMatrices
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    other_data: Optional[dict] = None,
    fixpar: Optional[List[str]] = None,
    init: Optional[Dict[str, np.ndarray]] = None,
    map_fix: Optional[Dict[str, np.ndarray]] = None,
    kalman_impl: str = "auto",
    mesh=None,
    mesh_axis: str = "tracks",
    reml: bool = False,
) -> ObjectiveBundle:
    other_data = dict(other_data or {})
    fixpar = list(fixpar or [])
    init = dict(init or {})
    map_fix = dict(map_fix or {})
    n, n_dim = obs.shape
    param_names = list(spec.param_names)
    n_par = len(param_names)

    # Content token over everything that shapes the traced computation
    # (model structure + data + options): the AOT executable cache
    # (utils/cache.py) keys serialized jax.export artifacts on it, so a
    # re-fit of the same model+data in a fresh process skips Python
    # tracing/lowering entirely — the TMB "compile once per model,
    # reuse across sessions" UX (vignette:262-338), except the traced
    # graph embeds the data as constants, so data is part of the key.
    cache_token = _content_token(
        spec, design, obs, times, ids, other_data, fixpar, init,
        map_fix, kalman_impl, mesh, mesh_axis, reml,
    )

    from smoothsde_tpu.utils.misc import device_float, device_int

    # Constant-column FE blocks (intercept-only formulas, the most
    # common case) collapse to a broadcast of a length-p dot product:
    # embedding an (n, 1) all-ones matrix per parameter adds n*4 bytes
    # of constants to every serialized/compiled executable — 20 MB of
    # literal ones for a 1M-step CTCRW, a measurable slice of the
    # per-process warm executable load through the remote tunnel.
    fe_const_rows = [
        np.asarray(X[0], float)
        if X.shape[0] > 0 and np.all(np.ptp(X, axis=0) == 0)
        else None
        for X in design.fe_blocks()
    ]
    fe_blocks = [
        None if fe_const_rows[j] is not None else device_float(X)
        for j, X in enumerate(design.fe_blocks())
    ]
    re_blocks = [device_float(X) for X in design.re_blocks()]
    ncol_fe = design.ncol_fe
    ncol_re_per_param = [X.shape[1] for X in design.re_blocks()]
    fe_off = np.concatenate([[0], np.cumsum(ncol_fe)]).astype(int)
    re_off = np.concatenate([[0], np.cumsum(ncol_re_per_param)]).astype(int)
    p_fe = int(fe_off[-1])
    p_re = int(re_off[-1])
    n_smooth = getattr(design, "n_lambda", len(design.ncol_re))
    has_re = p_re > 0

    obs_j = device_float(obs)
    times_j = device_float(times)
    ids_j = device_int(ids)
    # Inter-observation intervals computed HOST-SIDE in f64 before any
    # device cast: diff() of f32-encoded absolute times quantizes dt
    # (~3% at t ~ 3e4) and dominated the measured long-horizon f32
    # error; the intervals themselves are f32-exact to ~6e-8 relative.
    from smoothsde_tpu.ops.kalman_soa import precompute_dt

    dt_j = device_float(precompute_dt(times, ids))
    loglik_ad = None  # forward-mode-capable twin, set where it differs
    # Host-side plan to batch the AD-twin's sequential filter per track
    # (scan depth = longest track instead of total n); None when it
    # cannot help.
    from smoothsde_tpu.ops.kalman import track_pad_plan

    track_plan = track_pad_plan(np.asarray(ids))

    # ---- decay-modulated splines (closed-form models only,
    #      R/sde.R:634-653, nllk_sde.hpp:47-58) ----
    decay_enabled = (
        spec.type in _CLOSED_FORM and other_data.get("t_decay") is not None
    )
    decay_map: List[tuple] = []  # (param_j, local_col, rate_idx)
    n_decay = 1
    t_decay_blocks = None
    if decay_enabled:
        t_decay = np.asarray(other_data["t_decay"], float)
        if t_decay.size != n * n_par:
            raise ValueError(
                "'t_decay' should have length (number of parameters) x "
                "(number of data)"
            )
        col_decay = np.atleast_1d(np.asarray(other_data["col_decay"], int))
        ind_decay = np.atleast_1d(np.asarray(other_data["ind_decay"], int))
        if len(col_decay) != len(ind_decay):
            raise ValueError("'col_decay' and 'ind_decay' lengths differ")
        n_decay = int(len(np.unique(ind_decay)))
        t_decay_blocks = device_float(t_decay.reshape(n_par, n))
        for c, ind in zip(col_decay, ind_decay):
            c0 = int(c) - 1  # 1-based as in the reference
            j = int(np.searchsorted(re_off, c0, side="right") - 1)
            decay_map.append((j, c0 - int(re_off[j]), int(ind) - 1))

    # ---- parameter blocks ----
    blocks: List[ParamBlock] = []

    def _init(name, size, default=0.0):
        v = np.asarray(init.get(name, np.full(size, default)), float).reshape(-1)
        if v.size != size:
            raise ValueError(f"init for {name!r} has wrong size")
        return v

    if spec.type in ("BM_SSM", "OU_SSM", "CTCRW"):
        fixed_sobs = np.array([other_data.get("H") is not None])
        if "log_sigma_obs" in map_fix:
            fixed_sobs = np.atleast_1d(np.asarray(map_fix["log_sigma_obs"], bool))
        # Data-driven default: sigma_obs ~ a fraction of the median
        # step length. The reference initializes log_sigma_obs at 0
        # (R/sde.R:505); when the true measurement noise is far below
        # sigma = 1 the initial gradient is enormous and BFGS's first
        # (unscaled) line-search leap can land on the tau -> inf
        # plateau where the surface is flat and the optimizer reports
        # spurious success. A measurement-scale start defuses that
        # knife edge (override via init or the map mechanism).
        step_med = float(
            np.nanmedian(np.abs(np.diff(np.asarray(obs, float), axis=0)))
        )
        default_ls = (
            float(np.log(0.3 * step_med))
            if np.isfinite(step_med) and step_med > 0
            else 0.0
        )
        blocks.append(
            ParamBlock(
                "log_sigma_obs",
                _init("log_sigma_obs", 1, default_ls),
                fixed_sobs,
            )
        )
    elif spec.type == "ESEAL_SSM":
        # Initial values from R/sde.R:606-609.
        for name, default in (
            ("log_tau", 0.0),
            ("a1", -0.578),
            ("log_a2", float(np.log(1.214))),
        ):
            fixed = np.atleast_1d(
                np.asarray(map_fix.get(name, [False]), bool)
            )
            blocks.append(ParamBlock(name, _init(name, 1, default), fixed))

    # coeff_fe, with fixpar columns pinned (R/sde.R:621-632)
    cfe_fixed = np.zeros(p_fe, bool)
    for j, pname in enumerate(param_names):
        if pname in fixpar:
            cfe_fixed[fe_off[j] : fe_off[j + 1]] = True
    if "coeff_fe" in map_fix:
        cfe_fixed = cfe_fixed | np.asarray(map_fix["coeff_fe"], bool)
    blocks.append(ParamBlock("coeff_fe", _init("coeff_fe", p_fe), cfe_fixed))

    # log_lambda: one per smooth; absent (fixed) when no random effects
    ll_fixed = np.full(max(n_smooth, 1), not has_re)
    if "log_lambda" in map_fix:
        ll_fixed = ll_fixed | np.asarray(map_fix["log_lambda"], bool)
    blocks.append(
        ParamBlock(
            "log_lambda", _init("log_lambda", max(n_smooth, 1), 0.0), ll_fixed
        )
    )

    if decay_enabled:
        blocks.append(
            ParamBlock(
                "log_decay",
                _init("log_decay", n_decay, 0.0),
                np.zeros(n_decay, bool),
            )
        )

    cre_fixed = np.zeros(max(p_re, 1), bool) if has_re else np.ones(1, bool)
    if "coeff_re" in map_fix and has_re:
        cre_fixed = cre_fixed | np.asarray(map_fix["coeff_re"], bool)
    blocks.append(
        ParamBlock("coeff_re", _init("coeff_re", max(p_re, 1)), cre_fixed)
    )

    # REML: integrate the fixed-effect coefficients out alongside the
    # smooth coefficients (TMB's documented REML construction,
    # random=c("coeff_fe", "coeff_re"); the reference only exposes ML,
    # R/sde.R:656-658).
    inner_blocks = ("coeff_fe", "coeff_re") if reml else "coeff_re"
    packer = ParamPacker(blocks, inner=inner_blocks)

    # ---- linear predictor ----
    # wide s(ID, bs='re') indicator blocks become gathers (w * c[idx])
    # instead of dense matvecs — the TPU-native form of the reference's
    # sparse design matrices (DATA_SPARSE_MATRIX, nllk_sde.hpp:28-30);
    # decay-modulated parameters keep the dense path (decay rescales
    # arbitrary columns at trace time)
    decay_params = {jj for jj, _, _ in decay_map}
    gather_plans = [None] * n_par
    if hasattr(design, "re_gather_plans"):
        for j, plan in enumerate(design.re_gather_plans()):
            if plan is not None and j not in decay_params:
                dense_idx, X_dense, gathers = plan
                gather_plans[j] = (
                    jnp.asarray(dense_idx),
                    jnp.asarray(X_dense),
                    [
                        (s, k, jnp.asarray(idx),
                         None if w is None else jnp.asarray(w))
                        for s, k, idx, w in gathers
                    ],
                )

    def par_matrix(full):
        cfe = full["coeff_fe"]
        cre = full["coeff_re"]
        cols = []
        for j in range(n_par):
            cfe_j = cfe[fe_off[j] : fe_off[j + 1]]
            if fe_const_rows[j] is not None:
                lp = jnp.broadcast_to(
                    jnp.asarray(fe_const_rows[j], cfe.dtype) @ cfe_j, (n,)
                )
            else:
                lp = fe_blocks[j] @ cfe_j
            if ncol_re_per_param[j] > 0:
                crej = cre[re_off[j] : re_off[j + 1]]
                if gather_plans[j] is not None:
                    dense_idx, X_dense, gathers = gather_plans[j]
                    if X_dense.shape[1]:
                        lp = lp + X_dense @ crej[dense_idx]
                    for s, k, idx, w in gathers:
                        g = crej[s : s + k][idx]
                        lp = lp + (g if w is None else w * g)
                    cols.append(lp)
                    continue
                Xre = re_blocks[j]
                if decay_enabled:
                    rate = jnp.exp(full["log_decay"])
                    for jj, local, rix in decay_map:
                        if jj == j:
                            factor = jnp.exp(-rate[rix] * t_decay_blocks[j])
                            Xre = Xre.at[:, local].set(Xre[:, local] * factor)
                lp = lp + Xre @ crej
            cols.append(lp)
        return jnp.stack(cols, axis=1)

    # ---- likelihood ----
    H_array = other_data.get("H")
    if H_array is not None:
        H_array = np.asarray(H_array, float)
        if H_array.ndim == 3 and H_array.shape[0] != n and H_array.shape[-1] == n:
            H_array = np.moveaxis(H_array, -1, 0)
        H_array = device_float(H_array)
    P0 = other_data.get("P0")
    if P0 is not None:
        P0 = device_float(P0)

    if spec.kind == "closed_form":
        other = {"df": float(other_data["df"])} if spec.type == "BM_t" else None

        def loglik(full):
            return closed_form_loglik(
                spec.type, obs_j, times_j, ids_j, par_matrix(full), other,
                dt=dt_j,
            )

        filter_states = None
        innovations = None
    else:
        if spec.type == "ESEAL_SSM":
            h = device_float(other_data["h"])
            R = device_float(other_data["R"])
            dep_fat = device_float(other_data["dep_fat"])
            # Priors on sigma^2 and tau^2. The reference hard-codes
            # Schick et al. (2013) inverse-gamma priors
            # (nllk_e_seal_ssm.hpp:215-216); here they are
            # user-suppliable (SURVEY §7 "What NOT to carry over"):
            #   priors="schick2013" (default) — the reference's values,
            #   priors=None — no priors,
            #   priors={"sigma2": (shape, scale), "tau2": (shape, scale)}
            #     — custom inverse-gamma hyperparameters (either key
            #     may be omitted).
            priors = other_data.get("priors", "schick2013")
            if priors == "schick2013":
                priors = {
                    "sigma2": (10.0 * n, 4.0 * (10.0 * n - 1.0)),
                    "tau2": (n / 2.0, n / 2.0 - 1.0),
                }
            elif priors in (None, "none"):
                priors = {}
            elif not isinstance(priors, dict):
                raise ValueError(
                    "other_data['priors'] must be 'schick2013', None, or "
                    "a dict with 'sigma2'/'tau2' (shape, scale) entries"
                )

            def _steps(full):
                return eseal_ssm_steps(
                    par_matrix(full), obs_j, times_j, ids_j,
                    full["log_tau"][0], full["a1"][0], full["log_a2"][0],
                    h, R, dep_fat, P0=P0, dt=dt_j,
                )

            def _eseal_prior_terms(full, pm):
                llk = jnp.zeros(())
                if "sigma2" in priors:
                    shape, scale = priors["sigma2"]
                    sigma0 = jnp.exp(pm[0, 1])
                    llk = llk + _dinvgamma_log(sigma0**2, shape, scale)
                if "tau2" in priors:
                    shape, scale = priors["tau2"]
                    tau = jnp.exp(full["log_tau"][0])
                    llk = llk + _dinvgamma_log(tau**2, shape, scale)
                return llk

            def loglik(full):
                pm = par_matrix(full)
                llk = kalman_loglik(_steps(full), impl=kalman_impl)
                return llk + _eseal_prior_terms(full, pm)

        else:
            builder = {
                "BM_SSM": bm_ssm_steps,
                "OU_SSM": ou_ssm_steps,
                "CTCRW": ctcrw_steps,
            }[spec.type]

            def _steps(full):
                return builder(
                    par_matrix(full), obs_j, times_j, ids_j,
                    sigma_obs=jnp.exp(full["log_sigma_obs"][0]),
                    H_array=H_array, P0=P0, dt=dt_j,
                )

            if H_array is None and P0 is None:
                # Isotropic observation noise, default init: the filter
                # factorizes exactly across response dims. Use the
                # structure-of-arrays kernels (ops/kalman_soa.py) on TPU
                # — elementwise VPU math with a blocked scan — and the
                # sequential per-dim scan on CPU (whose vjp is solid,
                # see ops/kalman.py on the XLA:CPU associative-scan
                # bug).
                from smoothsde_tpu.models.ssm import (
                    ctcrw_steps_perdim,
                    diag_ssm_steps_perdim,
                )
                from smoothsde_tpu.ops.kalman import (
                    default_filter_impl,
                    kalman_loglik_batched,
                )
                from smoothsde_tpu.ops.kalman_soa import (
                    ctcrw_loglik_soa,
                    diag_ssm_loglik_soa,
                )

                def loglik(full):
                    # Primary path: on TPU the fully fused Pallas
                    # filter with the Fisher-identity (smoother-based)
                    # custom_vjp gradient — reverse mode only. The
                    # Laplace layer routes every forward-mode /
                    # higher-order derivative through `loglik_ad`
                    # below, so random-effects fits run on this fast
                    # path too (round-2 change; previously has_re
                    # forced plain AD throughout).
                    impl = kalman_impl
                    if impl == "auto":
                        impl = (
                            "soa"
                            if default_filter_impl() == "parallel"
                            else "sequential"
                        )
                    sobs = jnp.exp(full["log_sigma_obs"][0])
                    if impl == "sqrt":
                        # square-root (Cholesky-form) filtering: the
                        # accuracy-optimal path for very long f32
                        # horizons (ops/kalman_sqrt.py), for the whole
                        # SSM family; gradients via plain AD through
                        # the scan.
                        from smoothsde_tpu.ops.kalman_sqrt import (
                            ctcrw_loglik_sqrt,
                            diag_ssm_loglik_sqrt,
                        )

                        scan = (
                            "blocked"
                            if default_filter_impl() == "parallel"
                            else "sequential"
                        )
                        if spec.type == "CTCRW":
                            return ctcrw_loglik_sqrt(
                                par_matrix(full), obs_j, times_j,
                                ids_j, sigma_obs=sobs, scan=scan,
                                dt=dt_j,
                            )
                        return diag_ssm_loglik_sqrt(
                            spec.type, par_matrix(full), obs_j,
                            times_j, ids_j, sigma_obs=sobs, scan=scan,
                            dt=dt_j,
                        )
                    if impl == "soa":
                        if spec.type == "CTCRW":
                            return ctcrw_loglik_soa(
                                par_matrix(full), obs_j, times_j,
                                ids_j, sigma_obs=sobs,
                                scan="fused", analytic_grad=True,
                                dt=dt_j,
                            )
                        from smoothsde_tpu.ops.diag_fused import (
                            diag_ssm_loglik_fused,
                        )

                        return diag_ssm_loglik_fused(
                            spec.type, par_matrix(full), obs_j,
                            times_j, ids_j, sigma_obs=sobs, dt=dt_j,
                        )
                    if spec.type == "CTCRW":
                        steps = ctcrw_steps_perdim(
                            par_matrix(full), obs_j, times_j, ids_j,
                            sigma_obs=sobs, P0=P0, dt=dt_j,
                        )
                    else:
                        steps = diag_ssm_steps_perdim(
                            spec.type, par_matrix(full), obs_j, times_j,
                            ids_j, sigma_obs=sobs, P0=P0, dt=dt_j,
                        )
                    return kalman_loglik_batched(steps, impl=impl)

                def loglik_ad(full):
                    # Forward-mode-capable twin: per-dim sequential
                    # lax.scan (solid vjp/jvp at every order on every
                    # backend) for moderate n, the plain-AD SoA
                    # blocked scan for long sequences on TPU. The
                    # sequential scan is latency-bound on device, so
                    # multi-track data is batched per track (scan
                    # depth = longest track, vmap width = tracks x
                    # dims) — the Laplace inner loop chains 6-8 such
                    # passes per outer eval, and cutting scan depth
                    # 8x cut the config-4 RE fit's per-eval cost ~4x.
                    # (The log-depth associative-scan filter is NOT
                    # used here: jacfwd-over-vjp through
                    # associative_scan compiles pathologically slowly
                    # — >10 min for the config-4 marginal vs ~70 s
                    # with the scan form.)
                    sobs = jnp.exp(full["log_sigma_obs"][0])
                    use_soa = (
                        default_filter_impl() == "parallel" and n >= 65536
                    )
                    if use_soa:
                        if spec.type == "CTCRW":
                            return ctcrw_loglik_soa(
                                par_matrix(full), obs_j, times_j, ids_j,
                                sigma_obs=sobs, dt=dt_j,
                            )
                        return diag_ssm_loglik_soa(
                            spec.type, par_matrix(full), obs_j, times_j,
                            ids_j, sigma_obs=sobs, dt=dt_j,
                        )
                    if spec.type == "CTCRW":
                        steps = ctcrw_steps_perdim(
                            par_matrix(full), obs_j, times_j, ids_j,
                            sigma_obs=sobs, P0=P0, dt=dt_j,
                        )
                    else:
                        steps = diag_ssm_steps_perdim(
                            spec.type, par_matrix(full), obs_j, times_j,
                            ids_j, sigma_obs=sobs, P0=P0, dt=dt_j,
                        )
                    if track_plan is not None:
                        from smoothsde_tpu.ops.kalman import (
                            batch_steps_by_track,
                        )

                        steps = batch_steps_by_track(steps, *track_plan)
                    return kalman_loglik_batched(steps, impl="sequential")

            else:
                def loglik(full):
                    return kalman_loglik(_steps(full), impl=kalman_impl)

        def filter_states(full):
            from smoothsde_tpu.ops.kalman import kalman_loglik_sequential

            return kalman_loglik_sequential(_steps(full), with_states=True)[1]

        def innovations(full):
            from smoothsde_tpu.ops.kalman import kalman_innovations

            return kalman_innovations(_steps(full))

    if loglik_ad is None:
        loglik_ad = loglik

    # ---- distributed likelihood override: tracks- or time-sharded ----
    loglik_ad_flat = loglik_ad  # pre-mesh twin (single-device, fwd-AD)
    if mesh is not None:
        if mesh_axis == "time":
            from smoothsde_tpu.parallel.dist import (
                build_time_sharded_loglik,
            )

            sharded = build_time_sharded_loglik(
                spec, obs, times, ids, mesh=mesh, axis=mesh_axis,
                other_data=other_data, H_array=H_array, P0=P0,
            )
        else:
            from smoothsde_tpu.parallel.dist import build_sharded_loglik

            sharded = build_sharded_loglik(
                spec, obs, times, ids, mesh=mesh, axis=mesh_axis,
                other_data=other_data, kalman_impl=kalman_impl,
                H_array=H_array, P0=P0,
            )

        if spec.type == "ESEAL_SSM":
            # the sharded builder covers only the data term; re-attach
            # the (replicated, O(1)) inverse-gamma priors here
            def loglik(full):  # noqa: F811
                pm = par_matrix(full)
                return sharded(full, pm) + _eseal_prior_terms(full, pm)

        else:
            def loglik(full):  # noqa: F811 — replaces the single-device path
                return sharded(full, par_matrix(full))

        loglik_ad = loglik

    # ---- penalty ----
    penalty = make_penalty(
        getattr(design, "S_groups", design.S_blocks),
        normalize=(spec.kind == "closed_form"),
    )

    def joint_nllk(full):
        val = -loglik(full)
        if has_re:
            val = val + penalty(full["coeff_re"], full["log_lambda"])
        return val

    def joint_nllk_ad(full):
        val = -loglik_ad(full)
        if has_re:
            val = val + penalty(full["coeff_re"], full["log_lambda"])
        return val

    def joint_nllk_ad_flat(full):
        # single-device forward-AD-capable twin of the (possibly
        # sharded) joint objective: the sdreport joint-precision
        # Hessian runs this on the host CPU — jax.hessian through a
        # mesh-closing shard_map can neither run under a single
        # default_device nor forward-differentiate the fused
        # custom_vjps (found by dryrun_multichip driving SDE.fit with
        # sdreport on a mesh)
        val = -loglik_ad_flat(full)
        if has_re:
            val = val + penalty(full["coeff_re"], full["log_lambda"])
        return val

    def joint_nllk_unpenalized(full):
        # include_penalty = 0: the closed-form dispatcher drops the
        # penalty entirely (nllk_sde.hpp:91); the Kalman templates have
        # no such flag and always include it (their joint objective is
        # built with the same code path, R/sde.R:663-669) — we mirror
        # the closed-form behavior for all types since the unpenalized
        # joint likelihood is what conditional AIC needs
        # (R/sde.R:1318-1328). Uses the AD-capable path: callers take
        # jax.hessian of this for the EDF trace (R/sde.R:1363).
        return -loglik_ad(full)

    # ---- compressed inner-Hessian plan (infer/coloring.py) ----
    # Only when the inner vector is exactly the full coeff_re (ML, no
    # pinned entries): the plan's column indexing must match the inner
    # vector one-to-one. Pure optimization — plan_coloring returns
    # None whenever exact reconstruction is not guaranteed.
    hess_plan = None
    if (
        has_re
        and not reml
        and not np.asarray(cre_fixed).any()
        and p_re >= 16
    ):
        from smoothsde_tpu.infer.coloring import plan_coloring

        pg_off = np.concatenate([[0], np.cumsum(design.ncol_re)]).astype(int)
        S_groups = getattr(design, "S_groups", [[S] for S in design.S_blocks])
        penalty_couplings = [
            (np.arange(pg_off[k], pg_off[k + 1]), S_groups[k])
            for k in range(len(design.ncol_re))
        ]
        hess_plan = plan_coloring(design.re_blocks(), penalty_couplings)

    return ObjectiveBundle(
        joint_nllk=joint_nllk,
        joint_nllk_unpenalized=joint_nllk_unpenalized,
        packer=packer,
        par_matrix=par_matrix,
        filter_states=filter_states if spec.kind == "ssm" else None,
        n_obs=n,
        joint_nllk_ad=joint_nllk_ad,
        innovations=innovations if spec.kind == "ssm" else None,
        hess_plan=hess_plan,
        kind=spec.kind,
        cache_token=cache_token,
        uses_mesh=mesh is not None,
        joint_nllk_ad_flat=joint_nllk_ad_flat,
    )
