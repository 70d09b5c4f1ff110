"""Formula capabilities demo (port of the reference's inst/example.R):
multiple smooths per formula, cubic-regression bases, factor-by smooths,
random effects — inspecting the resulting design matrices.

Run: python examples/multi_term_design.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from smoothsde_tpu import SDE  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n_id, n_per = 5, 100
    n = n_id * n_per
    data = {
        "ID": np.repeat([f"animal{i}" for i in range(n_id)], n_per),
        "time": np.tile(np.arange(n_per, dtype=float), n_id),
        "z": np.cumsum(rng.normal(size=n) * 0.3),
        "x1": rng.uniform(0, 10, n),
        "x2": rng.normal(size=n),
        "x3": rng.choice(["low", "high"], size=n),
    }

    sde = SDE(
        formulas={
            "mu": "~x1 + s(x2, k=8, bs='cr') + s(x2, k=6, by=x3)",
            "sigma": "~s(ID, bs='re') + s(x1, k=6, bs='cs')",
        },
        data=data, type="BM", response="z",
    )

    mats = sde.make_mat()
    terms = sde.terms()
    print("X_fe shape:", mats["X_fe"].shape)
    print("X_re shape:", mats["X_re"].shape)
    print("penalty blocks:", terms["ncol_re"], "->", terms["names_re"])
    print("fixed-effect columns:", terms["names_fe"])
    print("first re columns:", terms["names_re_all"][:6], "...")

    # design matrices for new covariate values (prediction path)
    grid = sde.make_mat_grid("x2")
    print("grid X_fe:", grid["X_fe"].shape, "grid X_re:", grid["X_re"].shape)


if __name__ == "__main__":
    main()
