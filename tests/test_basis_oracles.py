"""Independent external oracles for the spline-basis layer.

VERDICT r1 item 7 asks for external parity pinning of the basis
constructions (they are mgcv-*like* by construction from the published
algorithms, R/sde.R:396-408 delegates to mgcv). R/mgcv is not available
in this environment, so the pinning is done against genuinely
independent implementations instead:

  - cr: an exact-arithmetic sympy construction of the natural cubic
    interpolating spline (each basis function b_j interpolates the
    indicator delta_ij at the knots with natural boundary conditions),
    derived by solving the piecewise-cubic C^2 system symbolically —
    sharing no code or algorithm with formula/smooths.py's banded
    D/B^-1 construction (Wood 2017 s5.3.1). Both the design matrix and
    the penalty S = integral b_i'' b_j'' are pinned, the latter via
    exact symbolic integration.
  - bs: scipy.interpolate.BSpline.design_matrix (external library
    implementation of Cox-de Boor).
  - tp: the defining property of the thin-plate energy — for any
    coefficient vector, coef' S_full coef equals the bending energy
    integral of the represented function f (f''(x) = sum_j d_j
    |x - x_j| / 2 for eta(r) = r^3/12), evaluated by quadrature.
"""

import numpy as np
import pytest
import sympy as sp

from smoothsde_tpu.formula.smooths import (
    CRSmooth,
    TPSmooth,
    _bspline_design,
    _cr_design,
)


# ---------------------------------------------------------------------------
# cr: exact natural-cubic-spline oracle (sympy, exact rationals)
# ---------------------------------------------------------------------------

KNOTS = [sp.Rational(0), sp.Rational(3, 10), sp.Rational(11, 10),
         sp.Rational(2), sp.Rational(5, 2)]


def _natural_spline_pieces(values):
    """Exact piecewise cubics of the natural cubic spline interpolating
    `values` at KNOTS: returns per-interval sympy polynomials in x.

    Solved from first principles: each piece p_i = a_i + b_i t + c_i t^2
    + d_i t^3 (t = x - knot_i); unknowns from interpolation, C^1/C^2
    continuity, and natural (zero second derivative) end conditions.
    """
    k = len(KNOTS)
    x = sp.Symbol("x")
    coeffs = sp.symbols(f"a0:{k - 1} b0:{k - 1} c0:{k - 1} d0:{k - 1}")
    a = coeffs[: k - 1]
    b = coeffs[k - 1 : 2 * (k - 1)]
    c = coeffs[2 * (k - 1) : 3 * (k - 1)]
    d = coeffs[3 * (k - 1) :]
    pieces = [
        a[i] + b[i] * (x - KNOTS[i]) + c[i] * (x - KNOTS[i]) ** 2
        + d[i] * (x - KNOTS[i]) ** 3
        for i in range(k - 1)
    ]
    eqs = []
    for i in range(k - 1):
        eqs.append(sp.Eq(pieces[i].subs(x, KNOTS[i]), values[i]))
        eqs.append(sp.Eq(pieces[i].subs(x, KNOTS[i + 1]), values[i + 1]))
    for i in range(k - 2):
        eqs.append(
            sp.Eq(
                sp.diff(pieces[i], x).subs(x, KNOTS[i + 1]),
                sp.diff(pieces[i + 1], x).subs(x, KNOTS[i + 1]),
            )
        )
        eqs.append(
            sp.Eq(
                sp.diff(pieces[i], x, 2).subs(x, KNOTS[i + 1]),
                sp.diff(pieces[i + 1], x, 2).subs(x, KNOTS[i + 1]),
            )
        )
    eqs.append(sp.Eq(sp.diff(pieces[0], x, 2).subs(x, KNOTS[0]), 0))
    eqs.append(sp.Eq(sp.diff(pieces[-1], x, 2).subs(x, KNOTS[-1]), 0))
    sol = sp.solve(eqs, coeffs, dict=True)
    assert len(sol) == 1
    return [p.subs(sol[0]) for p in pieces]


@pytest.fixture(scope="module")
def cr_oracle():
    """Exact basis-function pieces for all k indicator interpolants."""
    k = len(KNOTS)
    return [
        _natural_spline_pieces([sp.Integer(i == j) for i in range(k)])
        for j in range(k)
    ]


def _eval_oracle(pieces_per_basis, xq):
    x = sp.Symbol("x")
    k1 = len(KNOTS) - 1
    out = np.zeros((len(xq), len(pieces_per_basis)))
    for col, pieces in enumerate(pieces_per_basis):
        for r, xv in enumerate(xq):
            i = min(
                max(np.searchsorted(np.asarray(KNOTS, float), xv,
                                    side="right") - 1, 0),
                k1 - 1,
            )
            out[r, col] = float(pieces[i].subs(x, sp.Rational(xv)))
    return out


def test_cr_design_matches_exact_natural_spline(cr_oracle):
    knots = np.asarray(KNOTS, float)
    # production F matrix, built from data whose quantile knots are KNOTS
    sm = CRSmooth("s(x)", knots, k=len(knots))
    F = sm._state.F
    xq = [0.1, 0.25, 0.3, 0.77, 1.3, 1.9, 2.2, 2.5]
    X = _cr_design(np.asarray(xq, float), knots, F)
    X_exact = _eval_oracle(cr_oracle, xq)
    np.testing.assert_allclose(X, X_exact, rtol=0, atol=1e-12)


def test_cr_penalty_matches_exact_bending_energy(cr_oracle):
    x = sp.Symbol("x")
    k = len(KNOTS)
    S_exact = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            acc = sp.Integer(0)
            for seg in range(k - 1):
                acc += sp.integrate(
                    sp.diff(cr_oracle[i][seg], x, 2)
                    * sp.diff(cr_oracle[j][seg], x, 2),
                    (x, KNOTS[seg], KNOTS[seg + 1]),
                )
            S_exact[i, j] = S_exact[j, i] = float(acc)

    knots = np.asarray(KNOTS, float)
    sm = CRSmooth("s(x)", knots, k=k)
    # undo the centering: S_full = D' B^-1 D is what the oracle pins
    Z = sm._state.Z
    # reconstruct S_full from the stored pre-centering pieces
    h = np.diff(knots)
    D = np.zeros((k - 2, k))
    B = np.zeros((k - 2, k - 2))
    for i in range(k - 2):
        D[i, i] = 1.0 / h[i]
        D[i, i + 1] = -1.0 / h[i] - 1.0 / h[i + 1]
        D[i, i + 2] = 1.0 / h[i + 1]
        B[i, i] = (h[i] + h[i + 1]) / 3.0
        if i < k - 3:
            B[i, i + 1] = B[i + 1, i] = h[i + 1] / 6.0
    S_full = D.T @ np.linalg.solve(B, D)
    np.testing.assert_allclose(S_full, S_exact, rtol=0, atol=1e-10)
    # and the centered penalty the model actually uses
    np.testing.assert_allclose(
        sm.S, Z.T @ S_exact @ Z, rtol=0, atol=1e-10
    )


def test_cr_extrapolation_matches_exact_tangent(cr_oracle):
    """Outside the knot range the basis extrapolates linearly with the
    boundary value and derivative of the exact spline."""
    x = sp.Symbol("x")
    knots = np.asarray(KNOTS, float)
    sm = CRSmooth("s(x)", knots, k=len(knots))
    F = sm._state.F
    for xv, b_idx, seg in ((-0.4, 0, 0), (3.1, len(KNOTS) - 1, len(KNOTS) - 2)):
        X = _cr_design(np.array([xv]), knots, F)[0]
        for col, pieces in enumerate(cr_oracle):
            fb = float(pieces[seg].subs(x, KNOTS[b_idx]))
            dfb = float(sp.diff(pieces[seg], x).subs(x, KNOTS[b_idx]))
            exact = fb + dfb * (xv - float(KNOTS[b_idx]))
            assert abs(X[col] - exact) < 1e-6, (xv, col)


# ---------------------------------------------------------------------------
# cc: exact periodic-natural-spline oracle (sympy)
# ---------------------------------------------------------------------------

CC_KNOTS = [sp.Rational(0), sp.Rational(1, 2), sp.Rational(6, 5),
            sp.Rational(9, 5), sp.Rational(5, 2)]


def _periodic_spline_pieces(values):
    """Exact piecewise cubics of the periodic cubic spline taking
    `values` at the K free knots of CC_KNOTS (last knot identified with
    the first): interpolation + C^1/C^2 at interior knots + periodic
    f', f'' across the wrap point."""
    K = len(CC_KNOTS) - 1
    x = sp.Symbol("x")
    coeffs = sp.symbols(f"A0:{K} B0:{K} C0:{K} D0:{K}")
    a, b = coeffs[:K], coeffs[K : 2 * K]
    c, d = coeffs[2 * K : 3 * K], coeffs[3 * K :]
    pieces = [
        a[i] + b[i] * (x - CC_KNOTS[i]) + c[i] * (x - CC_KNOTS[i]) ** 2
        + d[i] * (x - CC_KNOTS[i]) ** 3
        for i in range(K)
    ]
    vals = list(values) + [values[0]]
    eqs = []
    for i in range(K):
        eqs.append(sp.Eq(pieces[i].subs(x, CC_KNOTS[i]), vals[i]))
        eqs.append(sp.Eq(pieces[i].subs(x, CC_KNOTS[i + 1]), vals[i + 1]))
    for i in range(K - 1):
        for order in (1, 2):
            eqs.append(
                sp.Eq(
                    sp.diff(pieces[i], x, order).subs(x, CC_KNOTS[i + 1]),
                    sp.diff(pieces[i + 1], x, order).subs(x, CC_KNOTS[i + 1]),
                )
            )
    for order in (1, 2):  # periodic wrap
        eqs.append(
            sp.Eq(
                sp.diff(pieces[-1], x, order).subs(x, CC_KNOTS[-1]),
                sp.diff(pieces[0], x, order).subs(x, CC_KNOTS[0]),
            )
        )
    sol = sp.solve(eqs, coeffs, dict=True)
    assert len(sol) == 1
    return [p.subs(sol[0]) for p in pieces]


@pytest.fixture(scope="module")
def cc_oracle():
    K = len(CC_KNOTS) - 1
    return [
        _periodic_spline_pieces([sp.Integer(i == j) for i in range(K)])
        for j in range(K)
    ]


def test_cc_design_matches_exact_periodic_spline(cc_oracle):
    from smoothsde_tpu.formula.smooths import CCSmooth, _cc_design

    knots = np.asarray(CC_KNOTS, float)
    sm = CCSmooth("s(x)", knots, k=len(knots))
    F = sm._state.F
    x = sp.Symbol("x")
    xq = [0.1, 0.45, 0.5, 1.0, 1.7, 2.2, 2.49]
    X = _cc_design(np.asarray(xq, float), knots, F)
    K1 = len(CC_KNOTS) - 1
    for col, pieces in enumerate(cc_oracle):
        for r, xv in enumerate(xq):
            seg = min(
                max(np.searchsorted(knots, xv, side="right") - 1, 0), K1 - 1
            )
            exact = float(pieces[seg].subs(x, sp.Rational(xv)))
            assert abs(X[r, col] - exact) < 1e-12, (col, xv)
    # wrap: x beyond the period evaluates at x mod period
    period = knots[-1] - knots[0]
    Xw = _cc_design(np.asarray(xq, float) + period, knots, F)
    np.testing.assert_allclose(Xw, X, rtol=0, atol=1e-10)


def test_cc_penalty_matches_exact_bending_energy(cc_oracle):
    from smoothsde_tpu.formula.smooths import CCSmooth

    x = sp.Symbol("x")
    K = len(CC_KNOTS) - 1
    S_exact = np.zeros((K, K))
    for i in range(K):
        for j in range(i, K):
            acc = sp.Integer(0)
            for seg in range(K):
                acc += sp.integrate(
                    sp.diff(cc_oracle[i][seg], x, 2)
                    * sp.diff(cc_oracle[j][seg], x, 2),
                    (x, CC_KNOTS[seg], CC_KNOTS[seg + 1]),
                )
            S_exact[i, j] = S_exact[j, i] = float(acc)

    knots = np.asarray(CC_KNOTS, float)
    sm = CCSmooth("s(x)", knots, k=len(knots))
    Z = sm._state.Z
    np.testing.assert_allclose(
        sm.S, Z.T @ S_exact @ Z, rtol=0, atol=1e-10
    )


# ---------------------------------------------------------------------------
# bs: scipy external oracle
# ---------------------------------------------------------------------------


def test_bspline_design_vs_scipy():
    from scipy.interpolate import BSpline

    rng = np.random.default_rng(0)
    inner = np.sort(rng.uniform(0.1, 0.9, size=4))
    lo, hi = 0.0, 1.0
    degree = 3
    t = np.concatenate(
        [np.repeat(lo, degree + 1), inner, np.repeat(hi, degree + 1)]
    )
    k = len(t) - degree - 1
    xq = rng.uniform(0.0, 1.0 - 1e-9, size=200)
    ours = _bspline_design(xq, t, degree, k)
    theirs = BSpline.design_matrix(xq, t, degree).toarray()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# tp: defining-property energy identity
# ---------------------------------------------------------------------------


def test_tp_penalty_equals_bending_energy_integral():
    """For the thin-plate basis, coef' S coef must equal
    integral f''(x)^2 dx of the represented function — the defining
    property of the thin-plate penalty (Wood 2003). f is built directly
    from the radial representation f(x) = sum_j d_j |x - x_j|^3 / 12
    + linear, whose second derivative is sum_j d_j |x - x_j| / 2."""
    rng = np.random.default_rng(1)
    xdat = np.sort(rng.uniform(0.0, 2.0, size=40))
    sm = TPSmooth("s(x)", xdat, k=7)
    st = sm._state
    us = ((st.knots - st.shift) / st.scale).ravel()  # knots are (K, d)

    for trial in range(3):
        z = rng.normal(size=sm.X.shape[1])
        # spline coefficients in the radial representation
        full = st.T_transform @ z  # (k-2 spline dirs + 2 linear)
        delta = st.UkZ @ full[:-2]  # radial coefficients (standardized x)
        # The production penalty is the bending energy in STANDARDIZED
        # coordinates (the covariate is standardized for conditioning;
        # the constant rescaling is absorbed by lambda), so integrate
        # f_s''(xs)^2 dxs on the standardized axis.
        grid = np.linspace(us.min(), us.max(), 60001)
        fpp = 0.5 * np.abs(grid[:, None] - us[None, :]) @ delta
        energy = np.trapezoid(fpp**2, grid)
        quad = z @ sm.S @ z
        assert abs(energy - quad) / max(abs(quad), 1e-12) < 1e-5, trial


def test_tp_linear_functions_unpenalized():
    """The (un-shrunk) tp penalty must annihilate linear functions: the
    covariate itself is representable with zero bending energy."""
    rng = np.random.default_rng(2)
    xdat = np.sort(rng.uniform(-1.0, 3.0, size=50))
    sm = TPSmooth("s(x)", xdat, k=8)
    target = xdat - xdat.mean()  # centered linear function
    coef, res, *_ = np.linalg.lstsq(sm.X, target, rcond=None)
    fit = sm.X @ coef
    assert np.max(np.abs(fit - target)) < 1e-8
    assert coef @ sm.S @ coef < 1e-10 * (coef @ coef)
