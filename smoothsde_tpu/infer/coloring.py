"""Compressed (colored) Hessians for the Laplace inner Newton.

Why: the inner Newton needs H_bb, the Hessian of the joint nllk in ALL
smooth/random-effect coefficients. Dense jacfwd costs one forward-mode
pass per coefficient — for i.i.d. random effects over hundreds of
track IDs (s(ID, bs='re'), the package's flagship multi-animal use
case, R/sde.R:656-658) that is hundreds of likelihood passes per
Newton iteration. Structurally, however, an re coefficient only
touches its own track's observations: H_bb[i, j] can be nonzero only
when the two columns' row supports overlap or a penalty couples them.
Columns with disjoint interaction sets can share one probe vector, and
a single forward pass recovers all their Hessian columns at once —
TMB's CppAD sparse-Hessian coloring rebuilt for the JAX Laplace
(Curtis-Powell-Reid compression).

Reconstruction uses SYMMETRY both ways: entry (i, j) is read from
HP[i, color(j)] when column j is the only member of its color
interacting with i, else from HP[j, color(i)]. The plan builder
verifies on the host that every structurally-nonzero entry is
recoverable and returns None (dense fallback) otherwise — compression
is a pure optimization, never a semantics change.

Typical outcome: K tracks x (tau-re, nu-re) + one dense spline of
width q colors as q + 2 colors instead of 2K + q columns.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _interaction_matrix(supports: List[np.ndarray],
                        penalty_couplings: List[tuple], p: int) -> np.ndarray:
    """Boolean (p, p): columns i, j interact (possible H_bb[i,j] != 0):
    overlapping row supports, or a structurally-nonzero penalty entry
    couples them (an re smooth's identity penalty couples nothing;
    spline penalties are dense within their block)."""
    n_rows = max((int(s.max()) + 1 for s in supports if len(s)), default=0)
    inc = np.zeros((p, n_rows + 1), bool)
    for j, s in enumerate(supports):
        inc[j, s] = True
    inter = inc @ inc.T  # support overlap
    for cols, S_list in penalty_couplings:
        cols = np.asarray(cols, int)
        nz = np.zeros((len(cols), len(cols)), bool)
        for S in S_list:
            nz |= np.asarray(S) != 0.0
        inter[np.ix_(cols, cols)] |= nz
    np.fill_diagonal(inter, True)
    return inter


def _greedy_color(inter: np.ndarray) -> np.ndarray:
    """Greedy distance-1 coloring of the interaction graph (columns in
    one color are mutually non-interacting)."""
    p = inter.shape[0]
    colors = np.full(p, -1)
    order = np.argsort(-inter.sum(axis=1))  # most-connected first
    color_members: List[list] = []
    for j in order:
        for c, members in enumerate(color_members):
            if not inter[j, members].any():
                colors[j] = c
                members.append(j)
                break
        else:
            colors[j] = len(color_members)
            color_members.append([j])
    return colors


def plan_coloring(re_blocks, penalty_couplings) -> Optional[dict]:
    """Build the compressed-Hessian plan, or None when compression
    cannot help or exact reconstruction is not guaranteed.

    re_blocks: per-SDE-parameter dense design blocks (n, p_j) whose
      columns concatenate (in order) to the inner coefficient vector.
    penalty_couplings: list of (global column indices, [S matrices])
      per smooth block — coupling uses the STRUCTURAL nonzeros of the
      penalties (identity re penalties couple nothing).

    Returns {probe (p, C), row_idx (p, p), col_idx (p, p),
    mask (p, p), n_colors} with
      H[i, j] = HP[row_idx[i, j], col_idx[i, j]] where mask, 0 else.
    """
    cols = []
    for X in re_blocks:
        Xa = np.asarray(X)
        for j in range(Xa.shape[1]):
            cols.append(np.nonzero(Xa[:, j] != 0.0)[0])
    p = len(cols)
    if p == 0:
        return None
    inter = _interaction_matrix(cols, penalty_couplings, p)
    colors = _greedy_color(inter)
    C = int(colors.max()) + 1
    if C >= p:
        return None

    # validity: for entry (i, j), direction "via j's color" is clean
    # when j is the only member of color(j) interacting with i
    members = [np.nonzero(colors == c)[0] for c in range(C)]
    inter_count = np.zeros((p, C), int)  # row i x color c
    for c, mem in enumerate(members):
        inter_count[:, c] = inter[:, mem].sum(axis=1)

    row_idx = np.zeros((p, p), np.int32)
    col_idx = np.zeros((p, p), np.int32)
    ok = np.ones((p, p), bool)
    for i in range(p):
        for j in range(p):
            if not inter[i, j]:
                continue
            if inter_count[i, colors[j]] == 1:
                row_idx[i, j] = i
                col_idx[i, j] = colors[j]
            elif inter_count[j, colors[i]] == 1:
                row_idx[i, j] = j
                col_idx[i, j] = colors[i]
            else:
                ok[i, j] = False
    if not ok.all():
        return None  # dense fallback; never approximate

    probe = np.zeros((p, C))
    probe[np.arange(p), colors] = 1.0
    return {
        "probe": probe,
        "row_idx": row_idx,
        "col_idx": col_idx,
        "mask": inter,
        "n_colors": C,
        "p": p,
    }


def colored_hessian(grad_fn, plan):
    """Build hess(outer, b) -> dense (p, p) H_bb from `plan`, using one
    jvp pass of `grad_fn` per color (lax.map over colors)."""
    import jax
    import jax.numpy as jnp

    probe_T = jnp.asarray(plan["probe"].T)  # (C, p)
    row_idx = jnp.asarray(plan["row_idx"])
    col_idx = jnp.asarray(plan["col_idx"])
    mask = jnp.asarray(plan["mask"])

    def hess(outer, b):
        def one_color(v):
            _, hv = jax.jvp(lambda bb: grad_fn(outer, bb), (b,), (v,))
            return hv

        HP = jax.lax.map(one_color, probe_T.astype(b.dtype))  # (C, p)
        HP = HP.T  # (p, C)
        H = jnp.where(mask, HP[row_idx, col_idx], 0.0)
        # exact symmetry (reconstruction picks directions per entry)
        return 0.5 * (H + H.T)

    return hess
