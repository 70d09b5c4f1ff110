"""Formula parsing, smooth bases, and design assembly — including the
reference's shape contract (test_sde.R:53-72)."""

import numpy as np
import pytest

from smoothsde_tpu.formula.design import ColumnData, build_design
from smoothsde_tpu.formula.parser import parse_formula
from smoothsde_tpu.formula.smooths import CRSmooth, RESmooth, TPSmooth, _cr_design


class TestParser:
    def test_basic(self):
        f = parse_formula("~s(x1, k=5, bs='ts') + x2")
        assert f.intercept
        assert len(f.smooth_terms) == 1
        s = f.smooth_terms[0]
        assert (s.var, s.k, s.bs) == ("x1", 5, "ts")
        assert [t.expr for t in f.linear_terms] == ["x2"]

    def test_intercept_only(self):
        f = parse_formula("~1")
        assert f.intercept and not f.linear_terms and not f.smooth_terms

    def test_by_and_re(self):
        f = parse_formula("~s(ID, bs='re') + s(x2, k=5, by=x3)")
        assert f.smooth_terms[0].bs == "re"
        assert f.smooth_terms[1].by == "x3"

    def test_expression_term(self):
        f = parse_formula("~sin(2*pi*time/24) + x")
        assert f.linear_terms[0].expr == "sin(2*pi*time/24)"
        assert set(f.variables()) == {"time", "x"}

    def test_double_quoted_bs(self):
        f = parse_formula('~s(x1, k=5, bs="cs")')
        assert f.smooth_terms[0].bs == "cs"


class TestCRBasis:
    def test_interpolation_at_knots(self):
        """cr parameterizes by function values at knots: X(knots) = I."""
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 10, 200)
        sm = CRSmooth("s(x)", x, k=8)
        K = sm._state.knots
        X = _cr_design(K, K, sm._state.F)
        assert np.allclose(X, np.eye(8), atol=1e-10)

    def test_penalty_annihilates_linear(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 5, 100)
        sm = CRSmooth("s(x)", x, k=7)
        # In value-parameterization, a linear function is beta = a + b*knots.
        # The *uncentered* penalty annihilates it; after centering the
        # constant is gone, so test via the state directly.
        K = sm._state.knots
        beta_lin = 2.0 + 3.0 * K
        # reconstruct full S from D'B^-1 D via the basis internals:
        # S_c = Z' S Z, and a linear beta maps into z-space approximately;
        # instead check that evaluating the fitted basis at a linear
        # target gives near-zero penalty: solve min ||Xc - y||
        Xc = sm.X
        y = 2.0 + 3.0 * x
        coef, *_ = np.linalg.lstsq(Xc, y - y.mean(), rcond=None)
        assert coef @ sm.S @ coef < 1e-8 * (coef @ coef + 1)

    def test_shrinkage_full_rank(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 5, 100)
        sm = CRSmooth("s(x)", x, k=6, shrink=True)
        w = np.linalg.eigvalsh(sm.S)
        assert w.min() > 0

    def test_eval_round_trip_and_extrapolation(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 5, 120)
        sm = CRSmooth("s(x)", x, k=6)
        assert np.allclose(sm.eval(x), sm.X, atol=1e-12)
        # outside the range: columns extend linearly
        xs = np.array([-1.0, -0.5, 0.0])
        Xs = sm.eval(xs)
        d1 = Xs[1] - Xs[0]
        d2 = Xs[2] - Xs[1]
        assert np.allclose(d1, d2, atol=1e-8)


class TestTPBasis:
    def test_centered_and_penalty_psd(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(-2, 2, 150)
        sm = TPSmooth("s(x)", x, k=9, shrink=False)
        assert sm.X.shape == (150, 8)  # k-1 after centering
        assert np.allclose(sm.X.sum(axis=0), 0, atol=1e-8)
        w = np.linalg.eigvalsh(sm.S)
        assert w.min() > -1e-10

    def test_ts_full_rank(self):
        rng = np.random.default_rng(5)
        x = rng.uniform(-2, 2, 150)
        sm = TPSmooth("s(x)", x, k=5, shrink=True)
        assert np.linalg.eigvalsh(sm.S).min() > 0

    def test_function_recovery(self):
        """A smooth function is representable with low residual."""
        rng = np.random.default_rng(6)
        x = np.linspace(0, 1, 300) + rng.normal(size=300) * 1e-9
        y = np.sin(2 * np.pi * x)
        sm = TPSmooth("s(x)", x, k=12)
        X1 = np.column_stack([np.ones_like(x), sm.X])
        coef, *_ = np.linalg.lstsq(X1, y, rcond=None)
        assert np.max(np.abs(X1 @ coef - y)) < 5e-3

    def test_eval_round_trip(self):
        rng = np.random.default_rng(7)
        x = rng.uniform(-2, 2, 80)
        sm = TPSmooth("s(x)", x, k=6)
        assert np.allclose(sm.eval(x), sm.X, atol=1e-10)


class TestDesignAssembly:
    def _data(self, n_id=10, n_per=10, seed=0):
        rng = np.random.default_rng(seed)
        n = n_id * n_per
        return {
            "ID": np.repeat([f"a{i}" for i in range(n_id)], n_per),
            "time": np.tile(np.arange(n_per, dtype=float), n_id),
            "x1": rng.uniform(0, 1, n),
            "x2": rng.normal(size=n),
            "x3": rng.choice(["u", "v"], size=n),
            "z": rng.normal(size=n),
        }

    def test_reference_shape_contract(self):
        """Mirror of test_sde.R:53-72: coeff_fe len 3, coeff_re len 18,
        one lambda per smooth (3)."""
        data = self._data()
        d = build_design(
            {
                "mu": "~s(x1, k=5, bs='ts') + x2",
                "sigma": "~s(ID, bs='re') + s(x2, k=5, bs='ts')",
            },
            data,
        )
        assert sum(d.ncol_fe) == 3  # mu: intercept + x2; sigma: intercept
        assert sum(d.ncol_re) == 18  # 4 + 10 + 4
        assert len(d.ncol_re) == 3
        assert d.names_fe == ["mu.(Intercept)", "mu.x2", "sigma.(Intercept)"]
        assert d.ncol_re_names == ["mu.s(x1)", "sigma.s(ID)", "sigma.s(x2)"]
        assert d.stacked_X_fe().shape == (200, 3)
        assert d.stacked_X_re().shape == (200, 18)
        assert d.stacked_S().shape == (18, 18)

    def test_factor_parametric_term(self):
        data = self._data()
        d = build_design({"mu": "~x3", "sigma": "~1"}, data)
        assert d.names_fe == ["mu.(Intercept)", "mu.x3v", "sigma.(Intercept)"]
        X = d.per_param["mu"].X_fe
        assert np.allclose(X[:, 1], (np.asarray(data["x3"]) == "v").astype(float))

    def test_factor_by_smooth(self):
        data = self._data()
        d = build_design({"mu": "~s(x2, k=5, by=x3)", "sigma": "~1"}, data)
        # one centered smooth per level of x3
        assert len(d.ncol_re) == 2
        assert d.ncol_re == [4, 4]
        assert d.ncol_re_names == ["mu.s(x2):x3u", "mu.s(x2):x3v"]
        Xre = d.per_param["mu"].X_re
        u_rows = np.asarray(data["x3"]) == "u"
        assert np.allclose(Xre[~u_rows, :4], 0)
        assert np.allclose(Xre[u_rows, 4:], 0)

    def test_numeric_by_smooth(self):
        data = self._data()
        d = build_design({"mu": "~s(x1, k=5, by=z)", "sigma": "~1"}, data)
        assert d.ncol_re == [4]
        assert d.ncol_re_names == ["mu.s(x1):z"]

    def test_re_smooth_levels(self):
        data = self._data()
        d = build_design({"mu": "~s(ID, bs='re')", "sigma": "~1"}, data)
        assert d.ncol_re == [10]
        S = d.S_blocks[0]
        assert np.allclose(S, np.eye(10))

    def test_eval_new_data_matches_training_rows(self):
        data = self._data()
        d = build_design(
            {"mu": "~s(x1, k=6, bs='cs') + x2", "sigma": "~s(x2, k=4, bs='ts')"},
            data,
        )
        sub = {k: np.asarray(v)[10:20] for k, v in data.items()}
        ev = d.eval(ColumnData(sub))
        assert np.allclose(ev.fe_blocks[0], d.per_param["mu"].X_fe[10:20])
        assert np.allclose(ev.re_blocks[0], d.per_param["mu"].X_re[10:20])
        assert np.allclose(ev.re_blocks[1], d.per_param["sigma"].X_re[10:20])

    def test_expression_term_pi(self):
        data = self._data()
        d = build_design({"mu": "~sin(2*pi*time/24)", "sigma": "~1"}, data)
        expected = np.sin(2 * np.pi * np.asarray(data["time"]) / 24)
        assert np.allclose(d.per_param["mu"].X_fe[:, 1], expected)


class TestTwoDAndCyclic:
    def _data(self, n=80, seed=7):
        rng = np.random.default_rng(seed)
        return {
            "x1": rng.uniform(0, 2, n),
            "x2": rng.uniform(-1, 1, n),
            "hour": rng.uniform(0, 24, n),
        }

    def test_2d_tp_shape_and_eval_roundtrip(self):
        data = self._data()
        d = build_design(
            {"mu": "~s(x1, x2, k=12)", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 11  # k - 1 after centering
        assert fd.smooth_labels == ["s(x1,x2)"]
        ev = d.eval(ColumnData({k: np.asarray(v)[:10] for k, v in data.items()}))
        assert np.allclose(ev.re_blocks[0], fd.X_re[:10])

    def test_2d_tp_linear_null_space(self):
        """Centered linear functions of either covariate live in the
        penalty null space (m=2 null = {1, x, y})."""
        from smoothsde_tpu.formula.smooths import TPSmooth

        data = self._data(n=60)
        x = np.column_stack([data["x1"], data["x2"]])
        sm = TPSmooth("s(x1,x2)", x, k=14)
        for col in range(2):
            target = x[:, col] - x[:, col].mean()
            coef, *_ = np.linalg.lstsq(sm.X, target, rcond=None)
            assert np.max(np.abs(sm.X @ coef - target)) < 1e-8
            assert coef @ sm.S @ coef < 1e-10 * (coef @ coef)

    def test_2d_tp_penalizes_curvature(self):
        from smoothsde_tpu.formula.smooths import TPSmooth

        data = self._data(n=60)
        x = np.column_stack([data["x1"], data["x2"]])
        sm = TPSmooth("s(x1,x2)", x, k=14)
        target = x[:, 0] ** 2 + x[:, 0] * x[:, 1]
        target -= target.mean()
        coef, *_ = np.linalg.lstsq(sm.X, target, rcond=None)
        assert coef @ sm.S @ coef > 1e-6 * (coef @ coef)

    def test_cc_formula_integration(self):
        data = self._data()
        d = build_design({"mu": "~s(hour, k=6, bs='cc')", "sigma": "~1"}, data)
        fd = d.per_param["mu"]
        # cc: k-1 free values, minus 1 for centering
        assert fd.X_re.shape[1] == 4
        # periodic: shifting by the knot period reproduces the rows
        from smoothsde_tpu.formula.smooths import CCSmooth

        knots = fd.blocks[0].basis._state.knots
        period = knots[-1] - knots[0]
        shifted = {
            k: (np.asarray(v) + (period if k == "hour" else 0.0))
            for k, v in data.items()
        }
        ev = d.eval(ColumnData(shifted))
        assert np.allclose(ev.re_blocks[0], fd.X_re, atol=1e-8)

    def test_parser_rejects_2d_cr(self):
        import pytest
        from smoothsde_tpu.formula.parser import parse_formula

        with pytest.raises(ValueError):
            parse_formula("~s(x1, x2, bs='cr')")


class TestTensorSmooths:
    def _data(self, n=500, seed=11):
        rng = np.random.default_rng(seed)
        return {
            "x": rng.uniform(0, 1, n),
            "z": rng.uniform(0, 1, n),
        }

    def test_te_shapes_and_eval(self):
        data = self._data()
        d = build_design(
            {"mu": "~te(x, z, k=4, bs='cs')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 15  # 4*4 - 1 joint centering
        assert len(fd.S_groups[0]) == 2  # one penalty per margin
        assert d.n_lambda == 2
        assert d.lambda_labels == ["mu.te(x,z)[m1]", "mu.te(x,z)[m2]"]
        sub = {k: np.asarray(v)[:20] for k, v in data.items()}
        ev = d.eval(ColumnData(sub))
        assert np.allclose(ev.re_blocks[0], fd.X_re[:20])

    def test_ti_shapes(self):
        data = self._data()
        d = build_design(
            {"mu": "~ti(x, z, k=4, bs='cs')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 9  # (4-1)*(4-1), margins centered
        assert len(fd.S_groups[0]) == 2

    def test_te_penalties_act_per_margin(self):
        """A function of x alone must have (near-)zero energy under the
        z-margin penalty relative to the x-margin penalty (shrinkage eps
        aside) and vice versa — the anisotropy te exists for."""
        data = self._data(n=400)
        d = build_design(
            {"mu": "~te(x, z, k=5, bs='cs')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        S1, S2 = fd.S_groups[0]
        X = fd.X_re
        fx = np.sin(2 * np.pi * np.asarray(data["x"]))
        fx -= fx.mean()
        coef, *_ = np.linalg.lstsq(X, fx, rcond=None)
        e1 = coef @ S1 @ coef
        e2 = coef @ S2 @ coef
        assert e1 > 20 * e2, (e1, e2)  # wiggly in x, flat in z
        fz = np.sin(2 * np.pi * np.asarray(data["z"]))
        fz -= fz.mean()
        coef, *_ = np.linalg.lstsq(X, fz, rcond=None)
        assert coef @ S2 @ coef > 20 * (coef @ S1 @ coef)

    def test_te_penalty_matrices_spd_with_shrinkage(self):
        data = self._data()
        d = build_design(
            {"mu": "~te(x, z, k=4, bs='cs')", "sigma": "~1"}, data
        )
        S1, S2 = d.per_param["mu"].S_groups[0]
        w = np.linalg.eigvalsh(S1 + S2)
        assert w.min() > 0  # proper prior for the multi-penalty block

    def test_user_knots_set_cc_period(self):
        """SDE(knots={'hour': linspace(0, 24, k)}) pins the cyclic
        period to [0, 24] regardless of the data range (mgcv
        gam(knots=...) passthrough; the reference cannot forward this,
        R/sde.R:396-398)."""
        from smoothsde_tpu.formula.smooths import CCSmooth

        rng = np.random.default_rng(3)
        x = rng.uniform(2, 22, 100)
        sm = CCSmooth("s(hour)", x, k=6, knots=np.linspace(0, 24, 6))
        X0 = sm.eval(np.array([0.0, 3.3, 17.2]))
        X24 = sm.eval(np.array([24.0, 27.3, 41.2]))
        np.testing.assert_allclose(X0, X24, atol=1e-10)

    def test_user_knots_cr_dimension(self):
        from smoothsde_tpu.formula.smooths import CRSmooth

        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, 60)
        sm = CRSmooth("s(x)", x, k=10, knots=[0.0, 0.2, 0.5, 0.8, 1.0])
        assert sm.X.shape[1] == 4  # len(knots) - 1 after centering

    def test_te_per_margin_k(self):
        data = self._data()
        d = build_design(
            {"mu": "~te(x, z, k=(4, 6), bs='cs')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 23  # 4*6 - 1 joint centering
        S1, S2 = fd.S_groups[0]
        assert S1.shape == (23, 23) and S2.shape == (23, 23)

    def test_per_margin_k_rejected_for_1d(self):
        import pytest
        from smoothsde_tpu.formula.parser import parse_formula

        with pytest.raises(ValueError):
            parse_formula("~s(x, k=(4, 6))")


class TestReGatherPlans:
    def test_gather_matches_dense_matvec(self):
        rng = np.random.default_rng(0)
        n, n_id = 400, 40
        data = ColumnData({
            "ID": rng.integers(0, n_id, n),
            "x": rng.uniform(0, 1, n),
            "g": np.array(["a", "b"])[rng.integers(0, 2, n)],
        })
        d = build_design(
            {"mu": "~s(ID, bs='re') + s(x, k=5, bs='cs')", "sigma": "~1"},
            data,
        )
        plans = d.re_gather_plans(min_cols=16)
        assert plans[0] is not None and plans[1] is None
        dense_idx, X_dense, gathers = plans[0]
        X = d.per_param["mu"].X_re
        c = rng.normal(size=X.shape[1])
        ref = X @ c
        out = X_dense @ c[dense_idx]
        for s, k, idx, w in gathers:
            g = c[s : s + k][idx]
            out = out + (g if w is None else w * g)
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_factor_by_re_weight(self):
        rng = np.random.default_rng(1)
        n, n_id = 300, 30
        data = ColumnData({
            "ID": rng.integers(0, n_id, n),
            "g": np.array(["a", "b"])[rng.integers(0, 2, n)],
        })
        d = build_design({"mu": "~s(ID, bs='re', by=g)", "sigma": "~1"}, data)
        plans = d.re_gather_plans(min_cols=16)
        assert plans[0] is not None
        dense_idx, X_dense, gathers = plans[0]
        assert X_dense.shape[1] == 0 and len(gathers) == 2
        X = d.per_param["mu"].X_re
        c = rng.normal(size=X.shape[1])
        out = np.zeros(n)
        for s, k, idx, w in gathers:
            g = c[s : s + k][idx]
            out = out + (g if w is None else w * g)
        np.testing.assert_allclose(out, X @ c, atol=1e-12)

    def test_narrow_re_keeps_dense(self):
        rng = np.random.default_rng(2)
        data = ColumnData({"ID": rng.integers(0, 5, 100)})
        d = build_design({"mu": "~s(ID, bs='re')", "sigma": "~1"}, data)
        assert d.re_gather_plans(min_cols=16)[0] is None


class TestTensorTPMargins:
    def _data(self, n=400, seed=13):
        rng = np.random.default_rng(seed)
        return {"x": rng.uniform(0, 1, n), "z": rng.uniform(0, 1, n)}

    def test_te_ts_margins_shapes_and_eval(self):
        data = self._data()
        d = build_design(
            {"mu": "~te(x, z, k=5, bs='ts')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 24  # 5*5 - 1 joint centering
        assert len(fd.S_groups[0]) == 2
        sub = {k: np.asarray(v)[:15] for k, v in data.items()}
        ev = d.eval(ColumnData(sub))
        np.testing.assert_allclose(
            ev.re_blocks[0], fd.X_re[:15], atol=1e-9
        )

    def test_ti_ts_margins_centered(self):
        data = self._data()
        d = build_design(
            {"mu": "~ti(x, z, k=5, bs='ts')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        assert fd.X_re.shape[1] == 16  # (5-1)*(5-1)
        # margins centered: each margin basis sums to ~0 over the data
        for m in fd.blocks[0].basis._margins:
            np.testing.assert_allclose(
                m.X.sum(axis=0), 0.0, atol=1e-8
            )

    def test_te_ts_penalties_anisotropic_and_proper(self):
        data = self._data()
        d = build_design(
            {"mu": "~te(x, z, k=5, bs='ts')", "sigma": "~1"}, data
        )
        fd = d.per_param["mu"]
        S1, S2 = fd.S_groups[0]
        assert np.linalg.eigvalsh(S1 + S2).min() > 0
        X = fd.X_re
        fx = np.sin(2 * np.pi * np.asarray(data["x"]))
        fx -= fx.mean()
        coef, *_ = np.linalg.lstsq(X, fx, rcond=None)
        # the z-margin energy is not ~0 as for cs margins: 'ts'
        # shrinkage puts eps mass on the tp null space (incl. the
        # z-constant direction an x-only function uses); measured
        # ratio ~12.6 at k=5
        assert coef @ S1 @ coef > 5 * (coef @ S2 @ coef)

    def test_tp_uncentered_margin_spans_constant(self):
        from smoothsde_tpu.formula.smooths import TPSmooth

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, 200)
        sm = TPSmooth("s(x)", x, k=6, center=False)
        assert sm.X.shape[1] == 6  # no constraint absorbed
        # the uncentered basis contains the constant exactly
        c, res, *_ = np.linalg.lstsq(sm.X, np.ones(200), rcond=None)
        assert res.size == 0 or res[0] < 1e-18
