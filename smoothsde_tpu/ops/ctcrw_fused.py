"""Fully fused Pallas forward pass for the s=2 SoA Kalman filter.

The XLA pipeline (element build -> blocked scan -> cross-block fold ->
likelihood recovery) costs ~6 ms at 1M steps even though its bandwidth
floor is ~0.3 ms: every stage is a separate pass over 14-16 element
arrays. Here the whole forward filter runs as TWO Pallas kernels over
the 10 raw per-step input arrays:

  kernel 1: per lane-block, build filtering elements on the fly and
            compose them, emitting only each block's TOTAL element
            (14 small arrays, one value per block);
  phase 2:  exclusive prefix of the block totals in ONE small Pallas
            launch (_block_prefix_pallas) — the XLA associative_scan
            it replaces unrolled into ~2.5k tiny HLOs that cost more
            than both big kernels combined;
  kernel 2: re-run the within-block composition with the carry seeded
            by the block's prefix element (recompute-instead-of-store),
            emitting filtered moments (5 arrays) and the per-lane
            likelihood partial sums accumulated in VMEM.

Elements never touch HBM. Forward-only by design: gradients come from
the Fisher-identity custom_vjp (ops/kalman_smooth.py), which needs only
the filtered moments this kernel emits.

Element algebra and model conventions are identical to
ops/kalman_soa.py (s=2 CTCRW with Z = [1, 0], F[0][0] = 1, F[1][0] = 0)
and are tested to match the sequential reference filter exactly.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smoothsde_tpu.ops.kalman_soa import _combine2, Element2


def _interpret() -> bool:
    return bool(int(os.environ.get("SMOOTHSDE_PALLAS_INTERPRET", "0")))


class _Row:
    """Per-field view over a STACKED tile ref: _Row(ref, i)[l] == ref[l, i].

    Lets the kernels keep their `tiles.field[l]` access pattern while all
    per-step inputs travel as one (L_pad, k, MID, 128) array instead of k
    separate arrays (one HBM buffer, one BlockSpec, one layout pass)."""

    __slots__ = ("ref", "i")

    def __init__(self, ref, i):
        self.ref = ref
        self.i = i

    def __getitem__(self, l):
        return self.ref[l, self.i]


def _stack_tiles(raw, pad_vals, d, n, NB, L, L_pad, MID, dtype):
    """Pad + transpose ALL per-step input arrays as ONE stacked tensor.

    raw: list of k (d, n) arrays; pad_vals: identity-padding value per
    array. Returns (L_pad, k, MID, 128) where row i, slot (l, m, j)
    holds raw[i][dim, block * L + l] with lane = dim * NB + block =
    m * 128 + j — the same tile layout to_tiles produced per-array, but
    via one concatenate + one transpose + bitcast reshapes. The
    per-array form unrolled to ~95 small pad/copy/reshape HLOs (~0.9 ms
    of the 1.6 ms device time at 1M steps); the elementwise producers
    of `raw` now fuse into a single materialization pass.
    """
    k = len(raw)
    x = jnp.stack([jnp.broadcast_to(r, (d, n)).astype(dtype) for r in raw])
    pv = jnp.asarray(pad_vals, dtype).reshape(k, 1, 1)
    pad_n = NB * L - n
    if pad_n:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pv, (k, d, pad_n))], axis=2
        )
    x = x.reshape(k, d, NB, L)
    x = jnp.transpose(x, (3, 0, 1, 2)).reshape(L, k, MID, 128)
    if L_pad != L:
        tail = jnp.broadcast_to(
            pv.reshape(1, k, 1, 1), (L_pad - L, k, MID, 128)
        )
        x = jnp.concatenate([x, tail], axis=0)
    return x


def _unstack_tiles(x, d, n, NB, L, L_pad, MID):
    """Inverse of _stack_tiles for kernel OUTPUTS: (L_pad, k, MID, 128)
    -> list of k (d, n) arrays, via one transpose."""
    k = x.shape[1]
    x = x[:L].reshape(L, k, d, NB)
    x = jnp.transpose(x, (1, 2, 3, 0)).reshape(k, d, NB * L)[:, :, :n]
    return [x[i] for i in range(k)]


class _Tiles(NamedTuple):
    """Blocked (L_pad, MID, 128) input tiles. Lane = dim * NB + block."""

    f01: jax.Array
    f11: jax.Array
    q00: jax.Array
    q01: jax.Array
    q11: jax.Array
    c0: jax.Array
    c1: jax.Array
    y: jax.Array
    rst: jax.Array  # reset mask as f32
    upd: jax.Array  # update mask as f32


_N_TOT = 14  # composed-element components: A(4) b(2) C(3) eta(2) J(3)


def _elem_from_inputs(t, p0_pos, p0_vel, h, l):
    """Build the step-l filtering element from input tile rows.

    Branch-free three-way select with 0/1 masks; exploits F[0][0] = 1,
    F[1][0] = 0 and symmetric C/J. Returns an Element2 of (8, 128)
    arrays (C/J tuples share the off-diagonal array).
    """
    return _elem_from_vals(
        t.f01[l], t.f11[l], t.q00[l], t.q01[l], t.q11[l],
        t.c0[l], t.c1[l], t.y[l], t.rst[l], t.upd[l],
        p0_pos, p0_vel, h,
    )


def _elem_from_vals(f01, f11, q00, q01, q11, c0, c1, y, R, U,
                    p0_pos, p0_vel, h):
    """Filtering element from raw transition/observation values (the
    body of _elem_from_inputs, shared with the par-space forward
    kernels which rebuild the transition in-register)."""
    S = q00 + h
    inv_s = 1.0 / S
    K0 = q00 * inv_s
    K1 = q01 * inv_s
    r = y - c0

    # update-element components
    uA00 = 1.0 - K0
    uA01 = (1.0 - K0) * f01
    uA10 = -K1
    uA11 = f11 - K1 * f01
    ub0 = c0 + K0 * r
    ub1 = c1 + K1 * r
    uC00 = (1.0 - K0) * q00
    uC01 = (1.0 - K0) * q01
    uC11 = q11 - K1 * q01
    ue0 = r * inv_s
    ue1 = f01 * r * inv_s
    uJ00 = inv_s
    uJ01 = f01 * inv_s
    uJ11 = f01 * f01 * inv_s

    # select: reset / update / propagate-only (masks are 0/1 floats)
    prop = (1.0 - R) * (1.0 - U)
    updm = (1.0 - R) * U
    A00 = updm * uA00 + prop * 1.0
    A01 = updm * uA01 + prop * f01
    A10 = updm * uA10
    A11 = updm * uA11 + prop * f11
    b0 = R * y + updm * ub0 + prop * c0
    b1 = updm * ub1 + prop * c1
    C00 = R * p0_pos + updm * uC00 + prop * q00
    C01 = updm * uC01 + prop * q01
    C11 = R * p0_vel + updm * uC11 + prop * q11
    e0 = updm * ue0
    e1 = updm * ue1
    J00 = updm * uJ00
    J01 = updm * uJ01
    J11 = updm * uJ11

    return Element2(
        A=((A00, A01), (A10, A11)),
        b=(b0, b1),
        C=((C00, C01), (C01, C11)),
        eta=(e0, e1),
        J=((J00, J01), (J01, J11)),
    )


def _pack_elem(e: Element2):
    return [
        e.A[0][0], e.A[0][1], e.A[1][0], e.A[1][1],
        e.b[0], e.b[1],
        e.C[0][0], e.C[0][1], e.C[1][1],
        e.eta[0], e.eta[1],
        e.J[0][0], e.J[0][1], e.J[1][1],
    ]


def _unpack_elem_full(v) -> Element2:
    return Element2(
        A=((v[0], v[1]), (v[2], v[3])),
        b=(v[4], v[5]),
        C=((v[6], v[7]), (v[7], v[8])),
        eta=(v[9], v[10]),
        J=((v[11], v[12]), (v[12], v[13])),
    )


_ID_VALS = [1.0, 0.0, 0.0, 1.0,  # A = I
            0.0, 0.0,            # b
            0.0, 0.0, 0.0,       # C
            0.0, 0.0,            # eta
            0.0, 0.0, 0.0]       # J


def _block_prefix_pallas(totals, id_vals, unpack, pack, combine,
                         NB, MID, dtype, reverse, interpret):
    """Exclusive cross-block prefix (suffix when reverse=True) of the
    per-block total elements in ONE Pallas launch.

    Replaces the XLA `lax.associative_scan` phase-2, which unrolls into
    thousands of tiny slice/concat/combine HLOs (measured ~2.5k ops and
    >1 ms device time per evaluation at NB = 2048 — dwarfing the fused
    kernels themselves).

    totals: n_comp (MID, 128) arrays; lane ℓ = dd * NB + b with block
    index b fastest (row-major over the (MID, 128) tile, RPD = NB // 128
    rows per dim). Fully vectorized in-kernel scan:
      (i)  Hillis-Steele inclusive scan across the 128 lanes of every
           row (7 shift-combine rounds);
      (ii) segmented Hillis-Steele scan of the row totals across rows
           (log2(RPD) rounds, masked at dim boundaries);
      (iii) one lane shift + one row shift convert inclusive to
           exclusive; out = combine(row_carry, lane_exclusive).
    Requires NB % 128 == 0 and RPD a power of two (callers fall back to
    the XLA scan otherwise).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_comp = len(totals)
    RPD = NB // 128

    def shift_lane(xs, k):
        """Shift each row by k lanes (toward higher lanes when
        forward), filling vacated lanes with the identity."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (MID, 128), 1)
        sh = (128 - k) if reverse else k  # pltpu.roll needs shift >= 0
        out = []
        for c, idv in zip(xs, id_vals):
            rolled = pltpu.roll(c, sh, 1)
            keep = (lane <= 127 - k) if reverse else (lane >= k)
            out.append(jnp.where(keep, rolled, jnp.asarray(idv, dtype)))
        return out

    def shift_row(xs, k):
        """Shift by k rows, identity past the dim-segment boundary."""
        row = jax.lax.broadcasted_iota(jnp.int32, (MID, 128), 0)
        seg = row % RPD
        sh = (MID - k) if reverse else k
        out = []
        for c, idv in zip(xs, id_vals):
            rolled = pltpu.roll(c, sh, 0)
            keep = (seg <= RPD - 1 - k) if reverse else (seg >= k)
            out.append(jnp.where(keep, rolled, jnp.asarray(idv, dtype)))
        return out

    def comb(a_list, b_list):
        return pack(combine(unpack(a_list), unpack(b_list)))

    def kernel(*refs):
        xs = [r[...] for r in refs[:n_comp]]
        outs = refs[n_comp:]
        # (i) per-row inclusive lane scan
        k = 1
        while k < 128:
            xs = comb(shift_lane(xs, k), xs)
            k *= 2
        # (ii) row totals (the full-row composition sits at the last
        # lane forward / first lane reversed), broadcast across lanes
        edge = (slice(None), slice(0, 1)) if reverse \
            else (slice(None), slice(127, 128))
        tb = [jnp.broadcast_to(c[edge], (MID, 128)) for c in xs]
        k = 1
        while k < RPD:
            tb = comb(shift_row(tb, k), tb)
            k *= 2
        # (iii) inclusive -> exclusive
        carry = shift_row(tb, 1)
        lane_excl = shift_lane(xs, 1)
        res = comb(carry, lane_excl)
        for o, c in zip(outs, res):
            o[...] = c

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_comp)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_comp)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((MID, 128), dtype) for _ in range(n_comp)
        ],
        interpret=interpret,
    )(*totals)


def fused_filter(sys, want_moments: bool = True,
                 tiled_moments: bool = False, stitch=None):
    """Run the fused forward filter for a CtcrwSystem.

    Returns (llk, m_f (2-tuple of (d, n)), P_f (2x2 tuple)) with the
    same values as the XLA SoA pipeline (tested to fp equality).

    tiled_moments=True instead returns (llk, moments, None) with
    moments ONE stacked (L_pad, 5, MID, 128) array in the kernel's own
    tile layout (rows m0, m1, P00, P01, P11), for handing straight to
    fused_backward / fused_backward_par without the untile/retile
    round trip.

    stitch: optional callable Element2[(d,)] -> Element2[(d,)] mapping
    this call's INCLUSIVE total filtering element (the composition of
    every step it was given) to a PREFIX element composed of everything
    that precedes those steps. Used by the time-sharded path
    (parallel/dist.py): each device filters its chunk, `stitch`
    all-gathers the chunk totals over the mesh axis and returns the
    exclusive device prefix, and the seeded re-scan then produces
    globally exact moments and likelihood terms on every device.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    yd = sys.yd
    d, n = yd.shape
    dtype = yd.dtype
    p0_pos = float(sys.p0_pos)
    p0_vel = float(sys.p0_vel)

    # lanes = d * NB must tile onto (8, 128): NB a multiple of
    # 1024/gcd(d, 1024), grown toward 2048 while the data supports it
    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_CH = 16
    L_pad = -(-L // L_CH) * L_CH
    lanes = d * NB
    MID = lanes // 128
    n_lc = L_pad // L_CH
    grid = (MID // 8, n_lc)

    raw = [
        sys.Ft[0][1], sys.Ft[1][1],
        sys.Qt[0][0], sys.Qt[0][1], sys.Qt[1][1],
        sys.ct[0], sys.ct[1],
        yd,
        sys.reset.astype(dtype), sys.update.astype(dtype),
    ]
    # identity-behaving padding values per input (element -> identity):
    pad_vals = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]

    tiles = _stack_tiles(raw, pad_vals, d, n, NB, L, L_pad, MID, dtype)
    h_arr = jnp.broadcast_to(
        jnp.asarray(sys.h, dtype).reshape(1, 1), (1, 1)
    )

    in_spec = pl.BlockSpec(
        (L_CH, 10, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    mom_spec = pl.BlockSpec(
        (L_CH, 5, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    # ---- kernel 1: block totals ----
    def totals_kernel(h_ref, in_ref, *refs):
        ins = _Tiles(*(_Row(in_ref, i) for i in range(10)))
        outs = refs[:_N_TOT]
        car = refs[_N_TOT:]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_TOT):
                car[i][...] = jnp.full((8, 128), _ID_VALS[i], dtype)

        c = _unpack_elem_full([r[...] for r in car])
        for l in range(L_CH):
            e = _elem_from_inputs(ins, p0_pos, p0_vel, h, l)
            c = _combine2(c, e)
        new = _pack_elem(c)
        for i in range(_N_TOT):
            car[i][...] = new[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(_N_TOT):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        totals_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec],
        out_specs=[tot_spec] * _N_TOT,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * _N_TOT,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * _N_TOT,
        interpret=_interpret(),
    )(h_arr, tiles)

    # ---- phase 2: exclusive prefix across blocks per dim ----
    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        # single-launch in-kernel scan (the XLA associative_scan
        # unrolls to thousands of tiny HLOs; see _block_prefix_pallas)
        excl_tiles = _block_prefix_pallas(
            list(totals), _ID_VALS, _unpack_elem_full, _pack_elem,
            _combine2, NB, MID, dtype, reverse=False,
            interpret=_interpret(),
        )
    else:  # XLA fallback for exotic lane packings
        def to_dnb(x):
            return x.reshape(lanes)[: d * NB].reshape(d, NB)

        tot_dnb = [to_dnb(x) for x in totals]
        incl = jax.lax.associative_scan(
            _combine2, _unpack_elem_full(tot_dnb), axis=-1
        )
        incl_flat = _pack_elem(incl)
        excl = [
            jnp.concatenate(
                [jnp.full((d, 1), _ID_VALS[i], dtype), x[:, :-1]], axis=1
            )
            for i, x in enumerate(incl_flat)
        ]

        def from_dnb(x):
            return x.reshape(lanes).reshape(MID, 128)

        excl_tiles = [from_dnb(x) for x in excl]

    if stitch is not None:
        # Inclusive total of THIS call's steps, per dim: the exclusive
        # prefix at each dim's last block composed with that block's
        # total (blocks partition time contiguously; trailing padding
        # slots/blocks hold identity elements so the composition is
        # exact). Lane = dim * NB + block (tile row-major).
        last_idx = (np.arange(d) + 1) * NB - 1
        excl_last = _unpack_elem_full(
            [t.reshape(lanes)[last_idx] for t in excl_tiles]
        )
        tot_last = _unpack_elem_full(
            [t.reshape(lanes)[last_idx] for t in totals]
        )
        chunk_total = _combine2(excl_last, tot_last)
        seed = stitch(chunk_total)  # prefix of everything before us
        lane_dim = np.arange(lanes) // NB

        def _expand(c):  # (d,) -> (MID, 128) by lane's dim index
            return jnp.take(c, lane_dim, axis=0).reshape(MID, 128)

        seed_e = jax.tree.map(_expand, seed)
        excl_tiles = _pack_elem(
            _combine2(seed_e, _unpack_elem_full(excl_tiles))
        )

    # ---- kernel 2: seeded re-scan, moments + llk ----
    def scan_kernel(h_ref, in_ref, *refs):
        ins = _Tiles(*(_Row(in_ref, i) for i in range(10)))
        pref = refs[:_N_TOT]
        m_out = refs[_N_TOT]
        llk_out = refs[_N_TOT + 1]
        car = refs[_N_TOT + 2 : _N_TOT + 2 + _N_TOT]
        llk_acc = refs[_N_TOT + 2 + _N_TOT]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_TOT):
                car[i][...] = pref[i][...]
            llk_acc[...] = jnp.zeros((8, 128), dtype)

        c = _unpack_elem_full([r[...] for r in car])
        acc = llk_acc[...]
        for l in range(L_CH):
            # predictive llk term BEFORE absorbing step l
            m0p, m1p = c.b
            P00p, P01p = c.C[0]
            P11p = c.C[1][1]
            f01 = ins.f01[l]
            a_pred = m0p + f01 * m1p + ins.c0[l]
            Pp00 = (
                P00p + 2.0 * f01 * P01p + f01 * f01 * P11p + ins.q00[l]
            )
            F = Pp00 + h
            u = ins.y[l] - a_pred
            acc = acc + ins.upd[l] * (-0.5) * (jnp.log(F) + u * u / F)

            e = _elem_from_inputs(ins, p0_pos, p0_vel, h, l)
            c = _combine2(c, e)
            m_out[l, 0] = c.b[0]
            m_out[l, 1] = c.b[1]
            m_out[l, 2] = c.C[0][0]
            m_out[l, 3] = c.C[0][1]
            m_out[l, 4] = c.C[1][1]
        new = _pack_elem(c)
        for i in range(_N_TOT):
            car[i][...] = new[i]
        llk_acc[...] = acc

        @pl.when(lc == n_lc - 1)
        def _():
            llk_out[...] = llk_acc[...]

    outs = pl.pallas_call(
        scan_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec] + [tot_spec] * _N_TOT,
        out_specs=[mom_spec, tot_spec],
        out_shape=(
            jax.ShapeDtypeStruct((L_pad, 5, MID, 128), dtype),
            jax.ShapeDtypeStruct((MID, 128), dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), dtype)] * _N_TOT
            + [pltpu.VMEM((8, 128), dtype)]
        ),
        interpret=_interpret(),
    )(h_arr, tiles, *excl_tiles)

    llk = jnp.sum(outs[1])
    if not want_moments:
        return llk, None, None
    if tiled_moments:
        # single stacked (L_pad, 5, MID, 128) array: rows are
        # (m0, m1, P00, P01, P11), handed straight to the fused
        # backward without leaving the kernel layout
        return llk, outs[0], None

    m0, m1, P00, P01, P11 = _unstack_tiles(
        outs[0], d, n, NB, L, L_pad, MID
    )
    m_f = (m0, m1)
    P_f = ((P00, P01), (P01, P11))
    return llk, m_f, P_f


# ---------------------------------------------------------------------------
# Par-space forward: rebuild the entering transition in-register
# ---------------------------------------------------------------------------


class _ParStack(NamedTuple):
    """Row view over the SHARED 10-row par-space stack. Rows 0-8 are
    exactly fused_backward_par's input rows (slot i = par/dt of the
    transition LEAVING i), so ONE _stack_tiles pass serves both the
    forward and the backward kernels; row 9 (`live`) marks real slots
    (0 at padding) — the forward needs it because its prev-slot carry
    would otherwise drag the last real transition into the first pad
    slot, where the element must be the identity."""

    lt: jax.Array
    ln: jax.Array
    dtv: jax.Array
    mu: jax.Array
    te: jax.Array
    tvn: jax.Array
    y: jax.Array
    upd: jax.Array
    rst: jax.Array
    live: jax.Array


_PAR_ROWS = 10
_N_BD = 5  # boundary rows: prev lt, ln, dt, mu, rst per lane


def build_par_stack(mu, lt, ln, dtv, te, tvn, yd, upd, rst,
                    d, n, NB, L, L_pad, MID, dtype, ent=None):
    """The shared par-space input stack + per-lane boundary tiles.

    Returns (tiles (L_pad, 10, MID, 128), bd (5, MID, 128)). bd holds
    the PREVIOUS slot's (lt, ln, dt, mu, rst) for each lane's first
    step (step b*L - 1, a different lane's last step): the forward
    kernels carry prev-slot par across steps in scratch and must seed
    that carry at lane starts. Lane 0 rows are masked by rst = 1 (the
    global first step's entering transition is the identity).

    ent: optional (mu_ent (d, n), lt_ent (n,), ln_ent (n,),
    dt_ent (n,), prst (n,)) — GLOBALLY shifted entering copies for a
    time CHUNK of a longer sequence. bd is then read at the lane-start
    slots themselves (slot b*L's entering values = slot b*L - 1's
    leaving values, which for lane 0 live on the PREVIOUS device and
    cannot be recovered from the local rows); prst doubles as the
    rst-of-previous-slot row, with the true global start carrying
    prst[0] = 1."""
    raw = [lt, ln, dtv, mu, te, tvn, yd, upd, rst,
           jnp.ones((n,), dtype)]
    tiles = _stack_tiles(
        raw, [0.0] * _PAR_ROWS, d, n, NB, L, L_pad, MID, dtype
    )
    if ent is None:
        bidx = np.maximum(np.arange(NB) * L - 1, 0)
        bidx = np.minimum(bidx, n - 1)
        first = np.arange(NB) * L == 0  # lane starts the whole sequence
        b_mu, b_lt, b_ln, b_dt = mu, lt, ln, dtv
        rst_b = jnp.take(rst.astype(dtype), bidx, axis=0)
        rst_b = jnp.where(
            jnp.asarray(first), jnp.asarray(1.0, dtype), rst_b
        )
    else:
        b_mu, b_lt, b_ln, b_dt, prst = ent
        bidx = np.minimum(np.arange(NB) * L, n - 1)
        rst_b = jnp.take(prst.astype(dtype), bidx, axis=0)

    def lane_tile(row, is_mu=False):
        v = row[..., bidx] if is_mu else jnp.take(row, bidx, axis=0)
        v = jnp.broadcast_to(v, (d, NB)).astype(dtype)
        return v.reshape(MID, 128)

    rst_b = jnp.broadcast_to(rst_b, (d, NB)).reshape(MID, 128)
    bd = jnp.stack([
        lane_tile(b_lt), lane_tile(b_ln), lane_tile(b_dt),
        lane_tile(b_mu, is_mu=True), rst_b,
    ])
    return tiles, bd


def fused_filter_par(tiles, bd, h, *, d, n, NB, L, L_pad, MID, dtype,
                     p0_pos, p0_vel, want_moments=True,
                     tiled_moments=False, stitch=None):
    """Forward filter over the par-space stack (no element arrays).

    Mirrors fused_filter but rebuilds each step's ENTERING transition
    in-register from the PREVIOUS slot's par (carried in scratch across
    the chunked grid, seeded per lane from `bd`): the per-step terms do
    not depend on the scan carry, so their latency hides under the
    combine chain, while the XLA element-build pass and its 10-row
    stack disappear from the HBM budget (the 10-row par stack is SHARED
    with fused_backward_par). Values match fused_filter to ~1 ulp
    (em1_psi_phi_kernel vs the expm1-based XLA build)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = d * NB
    L_CH = 16
    n_lc = L_pad // L_CH
    grid = (MID // 8, n_lc)

    h_arr = jnp.broadcast_to(jnp.asarray(h, dtype).reshape(1, 1), (1, 1))

    in_spec = pl.BlockSpec(
        (L_CH, _PAR_ROWS, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    bd_spec = pl.BlockSpec(
        (_N_BD, 8, 128), lambda m, lc: (0, m, 0),
        memory_space=pltpu.VMEM,
    )
    mom_spec = pl.BlockSpec(
        (L_CH, 5, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    def _step_elem(ins, pv, l, h):
        """(element, new prev-par tuple) for slot l given prev-par pv =
        (lt, ln, dt, mu, rst) of slot l-1."""
        live = ins.live[l]
        # transition entering l = transition leaving l-1; identity when
        # l-1 was a reset OR l is padding (the prev carry would
        # otherwise drag the last real transition into the pads)
        Rm = 1.0 - live * (1.0 - pv[4])
        w = _par_terms_vals(pv[0], pv[1], pv[2], pv[3], Rm)
        e = _elem_from_vals(
            w["f01"], w["f11"], w["q00"], w["q01"], w["q11"],
            w["c0"], w["c1"], ins.y[l], ins.rst[l], ins.upd[l],
            p0_pos, p0_vel, h,
        )
        new_pv = (ins.lt[l], ins.ln[l], ins.dtv[l], ins.mu[l],
                  ins.rst[l])
        return e, w, new_pv

    # ---- kernel 1p: block totals ----
    def totals_kernel(h_ref, in_ref, bd_ref, *refs):
        ins = _ParStack(*(_Row(in_ref, i) for i in range(_PAR_ROWS)))
        outs = refs[:_N_TOT]
        car = refs[_N_TOT : 2 * _N_TOT]
        pvs = refs[2 * _N_TOT :]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_TOT):
                car[i][...] = jnp.full((8, 128), _ID_VALS[i], dtype)
            for i in range(_N_BD):
                pvs[i][...] = bd_ref[i]

        c = _unpack_elem_full([r[...] for r in car])
        pv = tuple(pvs[i][...] for i in range(_N_BD))
        for l in range(L_CH):
            e, _, pv = _step_elem(ins, pv, l, h)
            c = _combine2(c, e)
        new = _pack_elem(c)
        for i in range(_N_TOT):
            car[i][...] = new[i]
        for i in range(_N_BD):
            pvs[i][...] = pv[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(_N_TOT):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        totals_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec, bd_spec],
        out_specs=[tot_spec] * _N_TOT,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * _N_TOT,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * (_N_TOT + _N_BD),
        interpret=_interpret(),
    )(h_arr, tiles, bd)

    # ---- phase 2: exclusive prefix across blocks (+ device stitch) --
    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        excl_tiles = _block_prefix_pallas(
            list(totals), _ID_VALS, _unpack_elem_full, _pack_elem,
            _combine2, NB, MID, dtype, reverse=False,
            interpret=_interpret(),
        )
    else:
        def to_dnb(x):
            return x.reshape(lanes)[: d * NB].reshape(d, NB)

        tot_dnb = [to_dnb(x) for x in totals]
        incl = jax.lax.associative_scan(
            _combine2, _unpack_elem_full(tot_dnb), axis=-1
        )
        incl_flat = _pack_elem(incl)
        excl = [
            jnp.concatenate(
                [jnp.full((d, 1), _ID_VALS[i], dtype), x[:, :-1]],
                axis=1,
            )
            for i, x in enumerate(incl_flat)
        ]
        excl_tiles = [x.reshape(lanes).reshape(MID, 128) for x in excl]

    if stitch is not None:
        last_idx = (np.arange(d) + 1) * NB - 1
        excl_last = _unpack_elem_full(
            [t.reshape(lanes)[last_idx] for t in excl_tiles]
        )
        tot_last = _unpack_elem_full(
            [t.reshape(lanes)[last_idx] for t in totals]
        )
        chunk_total = _combine2(excl_last, tot_last)
        seed = stitch(chunk_total)
        lane_dim = np.arange(lanes) // NB

        def _expand(c):
            return jnp.take(c, lane_dim, axis=0).reshape(MID, 128)

        seed_e = jax.tree.map(_expand, seed)
        excl_tiles = _pack_elem(
            _combine2(seed_e, _unpack_elem_full(excl_tiles))
        )

    # ---- kernel 2p: seeded re-scan, moments + llk ----
    def scan_kernel(h_ref, in_ref, bd_ref, *refs):
        ins = _ParStack(*(_Row(in_ref, i) for i in range(_PAR_ROWS)))
        pref = refs[:_N_TOT]
        m_out = refs[_N_TOT]
        llk_out = refs[_N_TOT + 1]
        car = refs[_N_TOT + 2 : 2 * _N_TOT + 2]
        llk_acc = refs[2 * _N_TOT + 2]
        pvs = refs[2 * _N_TOT + 3 :]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_TOT):
                car[i][...] = pref[i][...]
            llk_acc[...] = jnp.zeros((8, 128), dtype)
            for i in range(_N_BD):
                pvs[i][...] = bd_ref[i]

        c = _unpack_elem_full([r[...] for r in car])
        acc = llk_acc[...]
        pv = tuple(pvs[i][...] for i in range(_N_BD))
        for l in range(L_CH):
            e, w, pv = _step_elem(ins, pv, l, h)
            # predictive llk term BEFORE absorbing step l
            m0p, m1p = c.b
            P00p, P01p = c.C[0]
            P11p = c.C[1][1]
            a_pred = m0p + w["f01"] * m1p + w["c0"]
            Pp00 = (
                P00p + 2.0 * w["f01"] * P01p
                + w["f01"] * w["f01"] * P11p + w["q00"]
            )
            F = Pp00 + h
            u = ins.y[l] - a_pred
            acc = acc + ins.upd[l] * (-0.5) * (jnp.log(F) + u * u / F)

            c = _combine2(c, e)
            m_out[l, 0] = c.b[0]
            m_out[l, 1] = c.b[1]
            m_out[l, 2] = c.C[0][0]
            m_out[l, 3] = c.C[0][1]
            m_out[l, 4] = c.C[1][1]
        new = _pack_elem(c)
        for i in range(_N_TOT):
            car[i][...] = new[i]
        llk_acc[...] = acc
        for i in range(_N_BD):
            pvs[i][...] = pv[i]

        @pl.when(lc == n_lc - 1)
        def _():
            llk_out[...] = llk_acc[...]

    outs = pl.pallas_call(
        scan_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec, bd_spec] + [tot_spec] * _N_TOT,
        out_specs=[mom_spec, tot_spec],
        out_shape=(
            jax.ShapeDtypeStruct((L_pad, 5, MID, 128), dtype),
            jax.ShapeDtypeStruct((MID, 128), dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), dtype)] * (_N_TOT + 1 + _N_BD)
        ),
        interpret=_interpret(),
    )(h_arr, tiles, bd, *excl_tiles)

    llk = jnp.sum(outs[1])
    if not want_moments:
        return llk, None, None
    if tiled_moments:
        return llk, outs[0], None
    m0, m1, P00, P01, P11 = _unstack_tiles(
        outs[0], d, n, NB, L, L_pad, MID
    )
    return llk, (m0, m1), ((P00, P01), (P01, P11))


# ---------------------------------------------------------------------------
# Fused backward: RTS smoother + Fisher-identity score in two kernels
# ---------------------------------------------------------------------------

from smoothsde_tpu.ops.kalman_smooth import Smooth2, _combine2_rev  # noqa: E402

_N_SM = 9  # smoothing-element components: E(4) g(2) L(3)


def _pack_sm(e: Smooth2):
    return [
        e.E[0][0], e.E[0][1], e.E[1][0], e.E[1][1],
        e.g[0], e.g[1],
        e.L[0][0], e.L[0][1], e.L[1][1],
    ]


def _unpack_sm(v) -> Smooth2:
    return Smooth2(
        E=((v[0], v[1]), (v[2], v[3])),
        g=(v[4], v[5]),
        L=((v[6], v[7]), (v[7], v[8])),
    )


_ID_SM = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]


class _BwdTiles(NamedTuple):
    """Inputs for the backward kernels (slot i carries the transition
    LEAVING i, i.e. entering i+1)."""

    fn01: jax.Array
    fn11: jax.Array
    qn00: jax.Array
    qn01: jax.Array
    qn11: jax.Array
    cn0: jax.Array
    cn1: jax.Array
    m0: jax.Array
    m1: jax.Array
    Pf00: jax.Array
    Pf01: jax.Array
    Pf11: jax.Array
    te: jax.Array  # track end (f32)
    tvn: jax.Array  # transition i->i+1 has a density (f32)
    y: jax.Array
    upd: jax.Array
    rst: jax.Array


def _smooth_elem(t, l):
    """Build the RTS smoothing element at step l from tile rows.

    Exploits Fn[0][0] = 1, Fn[1][0] = 0. Returns (Smooth2, G-tuple)
    with G the unmasked RTS gain (used by the lag-one covariance)."""
    return _smooth_elem_vals(
        t.fn01[l], t.fn11[l], t.qn00[l], t.qn01[l], t.qn11[l],
        t.cn0[l], t.cn1[l], t.m0[l], t.m1[l],
        t.Pf00[l], t.Pf01[l], t.Pf11[l], t.te[l],
    )


def _smooth_elem_vals(f01, f11, q00, q01, q11, c0, c1,
                      m0, m1, P00, P01, P11, TE):

    # Pp = Fn P Fn' + Qn  (row0 of Fn = (1, f01), row1 = (0, f11))
    Pp00 = P00 + 2.0 * f01 * P01 + f01 * f01 * P11 + q00
    Pp01 = f11 * (P01 + f01 * P11) + q01
    Pp11 = f11 * f11 * P11 + q11
    det = Pp00 * Pp11 - Pp01 * Pp01
    i00 = Pp11 / det
    i01 = -Pp01 / det
    i11 = Pp00 / det
    # P Fn': (P Fn')_{ab} = sum_k P_{ak} Fn_{bk} with Fn rows
    # (1, f01) and (0, f11)
    PF00 = P00 + f01 * P01
    PF01 = f11 * P01
    PF10 = P01 + f01 * P11
    PF11 = f11 * P11
    G00 = PF00 * i00 + PF01 * i01
    G01 = PF00 * i01 + PF01 * i11
    G10 = PF10 * i00 + PF11 * i01
    G11 = PF10 * i01 + PF11 * i11
    # g = m - G (Fn m + cn)
    u0 = m0 + f01 * m1 + c0
    u1 = f11 * m1 + c1
    g0 = m0 - (G00 * u0 + G01 * u1)
    g1 = m1 - (G10 * u0 + G11 * u1)
    # L = P - G Pp G'
    GP00 = G00 * Pp00 + G01 * Pp01
    GP01 = G00 * Pp01 + G01 * Pp11
    GP10 = G10 * Pp00 + G11 * Pp01
    GP11 = G10 * Pp01 + G11 * Pp11
    L00 = P00 - (GP00 * G00 + GP01 * G01)
    L01 = P01 - (GP00 * G10 + GP01 * G11)
    L11 = P11 - (GP10 * G10 + GP11 * G11)

    nTE = 1.0 - TE
    elem = Smooth2(
        E=((nTE * G00, nTE * G01), (nTE * G10, nTE * G11)),
        g=(TE * m0 + nTE * g0, TE * m1 + nTE * g1),
        L=(
            (TE * P00 + nTE * L00, TE * P01 + nTE * L01),
            (TE * P01 + nTE * L01, TE * P11 + nTE * L11),
        ),
    )
    return elem, (G00, G01, G10, G11)


def fused_backward(sys, m_f, P_f, gbar):
    """Fused smoother + score: cotangents for (Ft, ct, Qt, yd, h).

    Two Pallas kernels mirroring the forward pass, run in REVERSED time
    order (suffix composition): kernel 3 emits block totals of the
    smoothing elements, a tiny XLA pass builds exclusive suffixes, and
    kernel 4 recomputes the within-block backward scan while emitting
    the elementwise Fisher-identity score (cotangent) arrays directly.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    yd = sys.yd
    d, n = yd.shape
    dtype = yd.dtype
    p0_pos = float(sys.p0_pos)
    p0_vel = float(sys.p0_vel)

    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_CH = 16
    L_pad = -(-L // L_CH) * L_CH
    lanes = d * NB
    MID = lanes // 128
    n_lc = L_pad // L_CH
    grid = (MID // 8, n_lc)

    bc = lambda x: jnp.broadcast_to(x, (d, n))  # noqa: E731
    sb = lambda x: jnp.concatenate(  # noqa: E731  shift BACK (i+1 -> i)
        [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1
    )
    sb1 = lambda x: jnp.concatenate(  # noqa: E731  shift back, fill 1
        [x[..., 1:], jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1
    )

    reset = sys.reset
    te = jnp.concatenate([reset[1:], jnp.ones((1,), bool)])
    tv = (~reset) & (~sys.prev_reset)
    tvn = sb(tv.astype(dtype))

    raw = [
        bc(sb(sys.Ft[0][1])), bc(sb1(sys.Ft[1][1])),
        bc(sb(sys.Qt[0][0])), bc(sb(sys.Qt[0][1])), bc(sb(sys.Qt[1][1])),
        bc(sb(sys.ct[0])), bc(sb(sys.ct[1])),
        bc(te.astype(dtype)), bc(tvn),
        yd, bc(sys.update.astype(dtype)), bc(reset.astype(dtype)),
    ]
    # padding entries must form IDENTITY smoothing elements so they pass
    # the suffix composition through untouched: m = 0, P = I, Qn = 0,
    # Fn = I and te = 0 make G = I, g = 0, L = 0 (an absorbing te = 1
    # element would destroy the carried suffix). Scores stay masked via
    # tvn = upd = rst = 0.
    pad_vals = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                0.0, 0.0, 0.0, 0.0, 0.0]

    def to_tiles(x, pv):
        pad_n = NB * L - n
        if pad_n:
            x = jnp.concatenate(
                [x, jnp.full((d, pad_n), pv, dtype)], axis=1
            )
        x = x.reshape(d, NB, L)
        x = jnp.moveaxis(x, -1, 0).reshape(L, lanes)
        if L_pad != L:
            x = jnp.concatenate(
                [x, jnp.full((L_pad - L, lanes), pv, dtype)], axis=0
            )
        return x.reshape(L_pad, MID, 128)

    if P_f is None:
        # m_f carries the 5 moment rows straight from fused_filter's
        # kernel 2 as one stacked (L_pad, 5, MID, 128) array. Padded
        # slots hold real (pos-def) filter states, which under te = 0 /
        # Fn = I / Qn = 0 still form identity smoothing elements
        # (G = P P^{-1} = I, g = m - m = 0, L = P - P = 0), so the
        # suffix composition passes them through exactly like the
        # m = 0 / P = I padding of the untiled path.
        mtiles = [m_f[:, i] for i in range(5)]
    else:
        mraw = [m_f[0], m_f[1], P_f[0][0], P_f[0][1], P_f[1][1]]
        mpad = [0.0, 0.0, 1.0, 0.0, 1.0]
        mtiles = [to_tiles(x, pv) for x, pv in zip(mraw, mpad)]

    rest = [to_tiles(x, pv) for x, pv in zip(raw, pad_vals)]
    tiles = _BwdTiles(*rest[:7], *mtiles, *rest[7:])
    h_arr = jnp.asarray(sys.h, dtype).reshape(1, 1)

    rev_spec = pl.BlockSpec(
        (L_CH, 8, 128),
        lambda m, lc: (n_lc - 1 - lc, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    # ---- kernel 3: backward block totals ----
    def sm_totals_kernel(h_ref, *refs):
        ins = _BwdTiles(*refs[:17])
        outs = refs[17 : 17 + _N_SM]
        car = refs[17 + _N_SM :]
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _():
            for i in range(_N_SM):
                car[i][...] = jnp.full((8, 128), _ID_SM[i], dtype)

        acc = _unpack_sm([r[...] for r in car])
        for l in reversed(range(L_CH)):
            e, _ = _smooth_elem(ins, l)
            acc = _combine2_rev(acc, e)
        new = _pack_sm(acc)
        for i in range(_N_SM):
            car[i][...] = new[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(_N_SM):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        sm_totals_kernel,
        grid=grid,
        in_specs=[h_spec] + [rev_spec] * 17,
        out_specs=[tot_spec] * _N_SM,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * _N_SM,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * _N_SM,
        interpret=_interpret(),
    )(h_arr, *tiles)

    # ---- phase 2: exclusive SUFFIX composition across blocks ----
    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        excl_tiles = _block_prefix_pallas(
            list(totals), _ID_SM, _unpack_sm, _pack_sm,
            _combine2_rev, NB, MID, dtype, reverse=True,
            interpret=_interpret(),
        )
    else:
        def to_dnb(x):
            return x.reshape(lanes).reshape(d, NB)

        tot_dnb = [to_dnb(x) for x in totals]
        flipped = jax.tree.map(
            lambda x: jnp.flip(x, axis=-1), _unpack_sm(tot_dnb)
        )
        incl = jax.lax.associative_scan(_combine2_rev, flipped, axis=-1)
        incl = jax.tree.map(lambda x: jnp.flip(x, axis=-1), incl)
        incl_flat = _pack_sm(incl)
        excl = [
            jnp.concatenate(
                [x[:, 1:], jnp.full((d, 1), _ID_SM[i], dtype)], axis=1
            )
            for i, x in enumerate(incl_flat)
        ]
        excl_tiles = [x.reshape(lanes).reshape(MID, 128) for x in excl]

    # ---- kernel 4: seeded backward re-scan + score emission ----
    def score_kernel(h_ref, *refs):
        ins = _BwdTiles(*refs[:17])
        pref = refs[17 : 17 + _N_SM]
        cot = refs[17 + _N_SM : 17 + _N_SM + 8]
        hbar_out = refs[17 + _N_SM + 8]
        car = refs[17 + _N_SM + 9 : 17 + _N_SM + 9 + _N_SM]
        hacc = refs[17 + _N_SM + 9 + _N_SM]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_SM):
                car[i][...] = pref[i][...]
            hacc[...] = jnp.zeros((8, 128), dtype)

        acc = _unpack_sm([r[...] for r in car])
        ha = hacc[...]
        for l in reversed(range(L_CH)):
            # smoothed at i+1 is the incoming accumulator
            ms1_0, ms1_1 = acc.g
            Ps1_00, Ps1_01 = acc.L[0]
            Ps1_11 = acc.L[1][1]
            e, G = _smooth_elem(ins, l)
            acc = _combine2_rev(acc, e)
            ms0, ms1 = acc.g  # smoothed at i
            Ps00, Ps01 = acc.L[0]
            Ps11 = acc.L[1][1]

            TVn = ins.tvn[l]
            f01 = ins.fn01[l]
            f11 = ins.fn11[l]
            c0 = ins.cn0[l]
            c1 = ins.cn1[l]
            # sanitized Qn inverse
            q00 = TVn * ins.qn00[l] + (1.0 - TVn)
            q01 = TVn * ins.qn01[l]
            q11 = TVn * ins.qn11[l] + (1.0 - TVn)
            det = q00 * q11 - q01 * q01
            qi00 = q11 / det
            qi01 = -q01 / det
            qi11 = q00 / det

            # lag-one Cov(x_{i+1}, x_i | y) = P_s_{i+1} G'
            C00 = Ps1_00 * G[0] + Ps1_01 * G[1]
            C01 = Ps1_00 * G[2] + Ps1_01 * G[3]
            C10 = Ps1_01 * G[0] + Ps1_11 * G[1]
            C11 = Ps1_01 * G[2] + Ps1_11 * G[3]
            # E[x_i x_i'] and E[x_{i+1} x_i']
            Exx00 = Ps00 + ms0 * ms0
            Exx01 = Ps01 + ms0 * ms1
            Exx11 = Ps11 + ms1 * ms1
            Ex2x00 = C00 + ms1_0 * ms0
            Ex2x01 = C01 + ms1_0 * ms1
            Ex2x10 = C10 + ms1_1 * ms0
            Ex2x11 = C11 + ms1_1 * ms1
            # r = m_{i+1} - Fn m_i - cn ; Fn rows (1, f01), (0, f11)
            Fm0 = ms0 + f01 * ms1
            Fm1 = f11 * ms1
            r0 = ms1_0 - Fm0 - c0
            r1 = ms1_1 - Fm1 - c1

            # Fbar = Qinv (Ex2x1 - Fn Exx - cn m_i')   [needs rows]
            T00 = Ex2x00 - (Exx00 + f01 * Exx01) - c0 * ms0
            T01 = Ex2x01 - (Exx01 + f01 * Exx11) - c0 * ms1
            T10 = Ex2x10 - f11 * Exx01 - c1 * ms0
            T11 = Ex2x11 - f11 * Exx11 - c1 * ms1
            Fb01 = qi00 * T01 + qi01 * T11
            Fb11 = qi01 * T01 + qi11 * T11
            # cbar = Qinv r
            cb0 = qi00 * r0 + qi01 * r1
            cb1 = qi01 * r0 + qi11 * r1
            # E[r r'] = P_{i+1} + Fn P_i Fn' - C Fn' - Fn C' + r r'
            FP00 = Ps00 + 2.0 * f01 * Ps01 + f01 * f01 * Ps11
            FP01 = f11 * (Ps01 + f01 * Ps11)
            FP11 = f11 * f11 * Ps11
            CF00 = C00 + f01 * C01
            CF01 = f11 * C01
            CF10 = C10 + f01 * C11
            CF11 = f11 * C11
            E00 = Ps1_00 + FP00 - 2.0 * CF00 + r0 * r0
            E01 = Ps1_01 + FP01 - CF01 - CF10 + r0 * r1
            E11 = Ps1_11 + FP11 - 2.0 * CF11 + r1 * r1
            # Qbar = 0.5 (Qinv Errt Qinv - Qinv)
            A00 = qi00 * E00 + qi01 * E01
            A01 = qi00 * E01 + qi01 * E11
            A10 = qi01 * E00 + qi11 * E01
            A11 = qi01 * E01 + qi11 * E11
            Qb00 = 0.5 * ((A00 * qi00 + A01 * qi01) - qi00)
            Qb01 = 0.5 * ((A00 * qi01 + A01 * qi11) - qi01)
            Qb11 = 0.5 * ((A10 * qi01 + A11 * qi11) - qi11)

            cot[0][l] = TVn * Fb01
            cot[1][l] = TVn * Fb11
            cot[2][l] = TVn * Qb00
            cot[3][l] = TVn * Qb01
            cot[4][l] = TVn * Qb11
            cot[5][l] = TVn * cb0
            cot[6][l] = TVn * cb1

            # obs + prior score at i (gbar scaling applied outside)
            U = ins.upd[l]
            R = ins.rst[l]
            resid = ins.y[l] - ms0
            cot[7][l] = U * (-resid / h) + R * (-resid / p0_pos)
            Ey2 = resid * resid + Ps00
            ha = ha + U * (0.5 * Ey2 / (h * h) - 0.5 / h)

        new = _pack_sm(acc)
        for i in range(_N_SM):
            car[i][...] = new[i]
        hacc[...] = ha

        @pl.when(lc == n_lc - 1)
        def _():
            hbar_out[...] = hacc[...]

    outs = pl.pallas_call(
        score_kernel,
        grid=grid,
        in_specs=[h_spec] + [rev_spec] * 17 + [tot_spec] * _N_SM,
        out_specs=[rev_spec] * 8 + [tot_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((L_pad, MID, 128), dtype)] * 8
            + [jax.ShapeDtypeStruct((MID, 128), dtype)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), dtype)] * _N_SM
            + [pltpu.VMEM((8, 128), dtype)]
        ),
        interpret=_interpret(),
    )(h_arr, *tiles, *excl_tiles)

    def from_tiles(x):
        x = x.reshape(L_pad, lanes)[:L]
        x = x.reshape(L, d, NB)
        return jnp.moveaxis(x, 0, -1).reshape(d, NB * L)[:, :n]

    c_f01, c_f11, c_q00, c_q01, c_q11, c_c0, c_c1, c_y = (
        gbar * from_tiles(x) for x in outs[:8]
    )
    hbar = gbar * jnp.sum(outs[8])

    # score at slot i belongs to the transition ENTERING i+1: shift
    # forward; transition components shared across dims sum over d.
    def fwd1(x):  # (d, n) -> (d, n), slot i+1 <- slot i
        return jnp.concatenate(
            [jnp.zeros((d, 1), x.dtype), x[:, :-1]], axis=1
        )

    sum_d = lambda x: jnp.sum(x, axis=0)  # noqa: E731
    zero_n = jnp.zeros((n,), dtype)
    Ftbar = (
        (zero_n, sum_d(fwd1(c_f01))),
        (zero_n, sum_d(fwd1(c_f11))),
    )
    ctbar = (fwd1(c_c0), fwd1(c_c1))
    q01b = sum_d(fwd1(c_q01))
    Qtbar = (
        (sum_d(fwd1(c_q00)), q01b),
        (q01b, sum_d(fwd1(c_q11))),
    )
    ybar = c_y
    return Ftbar, ctbar, Qtbar, ybar, hbar.reshape(jnp.shape(sys.h))


class _BwdParTiles(NamedTuple):
    """Inputs for the PARAMETER-SPACE backward kernels. Slot i carries
    par/dt at i (the transition LEAVING i, entering i+1); the kernels
    rebuild the transition pieces from par in-register instead of
    reading 7 precomputed element tiles."""

    lt: jax.Array  # log tau, broadcast over dims
    ln: jax.Array  # log nu
    dtv: jax.Array  # f64-derived step interval
    mu: jax.Array  # per-dim drift target
    m0: jax.Array
    m1: jax.Array
    Pf00: jax.Array
    Pf01: jax.Array
    Pf11: jax.Array
    te: jax.Array  # track end (f32)
    tvn: jax.Array  # transition i->i+1 has a density (f32)
    y: jax.Array
    upd: jax.Array
    rst: jax.Array


def _par_terms(t, l):
    """Recompute the slot-l transition pieces from par rows.

    Same op sequence as kalman_soa._ctcrw_system +
    stable.ctcrw_transition_terms so the values match the forward
    kernels' element tiles; masked to the identity element at reset
    slots (R = 1) exactly like the sb-shifted tiles of the
    element-space backward. Padding slots (lt = ln = dtv = mu = 0)
    evaluate to the identity element with no extra masking
    (u = 0 -> e1 = 1, m1 = 0, phi = psi = 0)."""
    return _par_terms_vals(t.lt[l], t.ln[l], t.dtv[l], t.mu[l], t.rst[l])


def _par_terms_vals(lt, ln, dtv, m, R):
    """Transition pieces from raw par values, identity-masked where
    R = 1 (see _par_terms; shared by the par-space backward, which
    feeds each slot's OWN par = the transition leaving it, and the
    par-space forward, which feeds the PREVIOUS slot's par = the
    transition entering it)."""
    from smoothsde_tpu.ops.stable import em1_psi_phi_kernel

    tau = jnp.exp(lt)
    beta = 1.0 / tau
    nu = jnp.exp(ln)
    sigma2 = 4.0 * nu * nu / (jnp.pi * tau)
    u = beta * dtv
    e1, m1, psi_u, phi_u = em1_psi_phi_kernel(u)
    g = m1 / beta
    s3 = sigma2 / (beta * beta * beta)
    s2 = sigma2 / (2.0 * beta * beta)
    s1 = sigma2 / (2.0 * beta)
    q00 = s3 * phi_u
    q01 = s2 * (m1 * m1)
    q11 = s1 * (m1 * (1.0 + e1))
    bp = psi_u / beta
    bv = m1
    nR = 1.0 - R
    return dict(
        f01=nR * g, f11=R + nR * e1,
        q00=nR * q00, q01=nR * q01, q11=nR * q11,
        c0=nR * bp * m, c1=nR * bv * m,
        # unmasked intermediates for the chain rule (TVn masks the
        # score, and TVn = 0 wherever R = 1)
        u=u, e1=e1, m1=m1, g=g, bp=bp, bv=bv, dtv=dtv, m=m,
        s1=s1, s2=s2, s3=s3, uq00=q00, uq01=q01, uq11=q11,
    )


def _smooth_elem_par(t, l, w):
    return _smooth_elem_vals(
        w["f01"], w["f11"], w["q00"], w["q01"], w["q11"],
        w["c0"], w["c1"], t.m0[l], t.m1[l],
        t.Pf00[l], t.Pf01[l], t.Pf11[l], t.te[l],
    )


def fused_backward_par(yd, h, reset, prev_reset, update, p0_pos, p0_vel,
                       mu, lt, ln, dt, m_f, gbar, stitch=None,
                       te=None, tvn=None, tiles=None):
    """Parameter-space fused smoother + score.

    Same two-kernel structure as fused_backward, but the kernels
    rebuild the transition pieces from (log tau, log nu, mu, dt) tiles
    in-register and contract the Fisher cotangents through the
    par -> (F, Q, c) chain rule analytically (phi' = em1^2,
    psi' = em1). This removes the 7 sb-shifted element input tiles,
    emits 4 cotangent arrays instead of 8, and eliminates the XLA
    transpose chain of the element build (par cotangents land at slot
    i directly: the transition leaving i is built from par[i], so no
    forward shift or where-mask transposes remain).

    mu (d, n); lt/ln/dt (n,); m_f the 5 tiled filtered-moment arrays
    from fused_filter(tiled_moments=True).
    Returns (mubar (d, n), ltbar (n,), lnbar (n,), ybar (d, n), hbar).

    stitch: optional callable Smooth2[(d,)] -> Smooth2[(d,)] mapping
    this call's total reverse (smoothing) element to the exclusive
    SUFFIX element of everything after these steps — the time-sharded
    mirror of fused_filter's stitch (all_gather of chunk reverse
    totals). te / tvn: when the steps are a chunk of a longer
    sequence, the track-end and transition-has-density masks must be
    computed on the FULL sequence (they look one step ahead, across the
    chunk edge) and passed in; by default they are derived from `reset`
    with this call treated as the whole sequence.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = yd.shape
    dtype = yd.dtype
    p0_pos = float(p0_pos)

    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_CH = 16
    L_pad = -(-L // L_CH) * L_CH
    lanes = d * NB
    MID = lanes // 128
    n_lc = L_pad // L_CH
    grid = (MID // 8, n_lc)

    sb = lambda x: jnp.concatenate(  # noqa: E731  shift BACK (i+1 -> i)
        [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1
    )

    if tiles is None:
        if te is None:
            te = jnp.concatenate([reset[1:], jnp.ones((1,), bool)])
        if tvn is None:
            tv = (~reset) & (~prev_reset)
            tvn = sb(tv.astype(dtype))

        raw = [
            lt.astype(dtype), ln.astype(dtype),
            jnp.asarray(dt, dtype), mu.astype(dtype),
            te.astype(dtype), tvn,
            yd, update.astype(dtype), reset.astype(dtype),
        ]
        # zero padding everywhere: zero par/dt evaluates to the
        # identity element in _par_terms, zero te/tvn/upd/rst masks the
        # scores
        tiles = _stack_tiles(
            raw, [0.0] * 9, d, n, NB, L, L_pad, MID, dtype
        )
    # else: the SHARED par-space stack from build_par_stack — rows 0-8
    # are this function's input rows (row 9, `live`, is forward-only;
    # the 9-row BlockSpecs below never touch it)
    # m_f comes straight from fused_filter's kernel 2 as one stacked
    # (L_pad, 5, MID, 128) array; padded slots hold real pos-def filter
    # states which form identity smoothing elements under te = 0 /
    # identity transitions (see fused_backward)
    h_arr = jnp.asarray(h, dtype).reshape(1, 1)

    rev_spec = pl.BlockSpec(
        (L_CH, 9, 8, 128),
        lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    mf_spec = pl.BlockSpec(
        (L_CH, 5, 8, 128),
        lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    cot_spec = pl.BlockSpec(
        (L_CH, 4, 8, 128),
        lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    def _ins(in_ref, mf_ref):
        return _BwdParTiles(
            _Row(in_ref, 0), _Row(in_ref, 1),
            _Row(in_ref, 2), _Row(in_ref, 3),
            _Row(mf_ref, 0), _Row(mf_ref, 1), _Row(mf_ref, 2),
            _Row(mf_ref, 3), _Row(mf_ref, 4),
            _Row(in_ref, 4), _Row(in_ref, 5), _Row(in_ref, 6),
            _Row(in_ref, 7), _Row(in_ref, 8),
        )

    # ---- kernel 3: backward block totals ----
    def sm_totals_kernel(h_ref, in_ref, mf_ref, *refs):
        ins = _ins(in_ref, mf_ref)
        outs = refs[:_N_SM]
        car = refs[_N_SM:]
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _():
            for i in range(_N_SM):
                car[i][...] = jnp.full((8, 128), _ID_SM[i], dtype)

        acc = _unpack_sm([r[...] for r in car])
        for l in reversed(range(L_CH)):
            w = _par_terms(ins, l)
            e, _ = _smooth_elem_par(ins, l, w)
            acc = _combine2_rev(acc, e)
        new = _pack_sm(acc)
        for i in range(_N_SM):
            car[i][...] = new[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(_N_SM):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        sm_totals_kernel,
        grid=grid,
        in_specs=[h_spec, rev_spec, mf_spec],
        out_specs=[tot_spec] * _N_SM,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * _N_SM,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * _N_SM,
        interpret=_interpret(),
    )(h_arr, tiles, m_f)

    # ---- phase 2: exclusive SUFFIX composition across blocks ----
    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        excl_tiles = _block_prefix_pallas(
            list(totals), _ID_SM, _unpack_sm, _pack_sm,
            _combine2_rev, NB, MID, dtype, reverse=True,
            interpret=_interpret(),
        )
    else:
        def to_dnb(x):
            return x.reshape(lanes).reshape(d, NB)

        tot_dnb = [to_dnb(x) for x in totals]
        flipped = jax.tree.map(
            lambda x: jnp.flip(x, axis=-1), _unpack_sm(tot_dnb)
        )
        incl = jax.lax.associative_scan(_combine2_rev, flipped, axis=-1)
        incl = jax.tree.map(lambda x: jnp.flip(x, axis=-1), incl)
        incl_flat = _pack_sm(incl)
        excl = [
            jnp.concatenate(
                [x[:, 1:], jnp.full((d, 1), _ID_SM[i], dtype)], axis=1
            )
            for i, x in enumerate(incl_flat)
        ]
        excl_tiles = [x.reshape(lanes).reshape(MID, 128) for x in excl]

    if stitch is not None:
        # Total reverse element of THIS call's steps per dim: suffix at
        # each dim's FIRST block composed (on the left) with that
        # block's reverse total. _combine2_rev(acc, new) applies `new`
        # outside `acc`, i.e. combine_rev(right_segment, left_segment).
        first_idx = np.arange(d) * NB
        excl_first = _unpack_sm(
            [t.reshape(lanes)[first_idx] for t in excl_tiles]
        )
        tot_first = _unpack_sm(
            [t.reshape(lanes)[first_idx] for t in totals]
        )
        chunk_total = _combine2_rev(excl_first, tot_first)
        seed = stitch(chunk_total)  # suffix of everything after us
        lane_dim = np.arange(lanes) // NB

        def _expand(c):
            return jnp.take(c, lane_dim, axis=0).reshape(MID, 128)

        seed_e = jax.tree.map(_expand, seed)
        excl_tiles = _pack_sm(
            _combine2_rev(seed_e, _unpack_sm(excl_tiles))
        )

    # ---- kernel 4: seeded backward re-scan + par-space score ----
    def score_kernel(h_ref, in_ref, mf_ref, *refs):
        ins = _ins(in_ref, mf_ref)
        pref = refs[:_N_SM]
        cot = refs[_N_SM]
        hbar_out = refs[_N_SM + 1]
        car = refs[_N_SM + 2 : _N_SM + 2 + _N_SM]
        hacc = refs[_N_SM + 2 + _N_SM]
        lc = pl.program_id(1)
        h = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(_N_SM):
                car[i][...] = pref[i][...]
            hacc[...] = jnp.zeros((8, 128), dtype)

        acc = _unpack_sm([r[...] for r in car])
        ha = hacc[...]
        for l in reversed(range(L_CH)):
            # smoothed at i+1 is the incoming accumulator
            ms1_0, ms1_1 = acc.g
            Ps1_00, Ps1_01 = acc.L[0]
            Ps1_11 = acc.L[1][1]
            w = _par_terms(ins, l)
            e, G = _smooth_elem_par(ins, l, w)
            acc = _combine2_rev(acc, e)
            ms0, ms1 = acc.g  # smoothed at i
            Ps00, Ps01 = acc.L[0]
            Ps11 = acc.L[1][1]

            TVn = ins.tvn[l]
            f01 = w["f01"]
            f11 = w["f11"]
            c0 = w["c0"]
            c1 = w["c1"]
            # sanitized Qn inverse
            q00 = TVn * w["q00"] + (1.0 - TVn)
            q01 = TVn * w["q01"]
            q11 = TVn * w["q11"] + (1.0 - TVn)
            det = q00 * q11 - q01 * q01
            qi00 = q11 / det
            qi01 = -q01 / det
            qi11 = q00 / det

            # lag-one Cov(x_{i+1}, x_i | y) = P_s_{i+1} G'
            C00 = Ps1_00 * G[0] + Ps1_01 * G[1]
            C01 = Ps1_00 * G[2] + Ps1_01 * G[3]
            C10 = Ps1_01 * G[0] + Ps1_11 * G[1]
            C11 = Ps1_01 * G[2] + Ps1_11 * G[3]
            # E[x_i x_i'] and E[x_{i+1} x_i']
            Exx00 = Ps00 + ms0 * ms0
            Exx01 = Ps01 + ms0 * ms1
            Exx11 = Ps11 + ms1 * ms1
            Ex2x00 = C00 + ms1_0 * ms0
            Ex2x01 = C01 + ms1_0 * ms1
            Ex2x10 = C10 + ms1_1 * ms0
            Ex2x11 = C11 + ms1_1 * ms1
            # r = m_{i+1} - Fn m_i - cn ; Fn rows (1, f01), (0, f11)
            Fm0 = ms0 + f01 * ms1
            Fm1 = f11 * ms1
            r0 = ms1_0 - Fm0 - c0
            r1 = ms1_1 - Fm1 - c1

            # Fbar = Qinv (Ex2x1 - Fn Exx - cn m_i')   [needs rows]
            T01 = Ex2x01 - (Exx01 + f01 * Exx11) - c0 * ms1
            T11 = Ex2x11 - f11 * Exx11 - c1 * ms1
            Fb01 = qi00 * T01 + qi01 * T11
            Fb11 = qi01 * T01 + qi11 * T11
            # cbar = Qinv r
            cb0 = qi00 * r0 + qi01 * r1
            cb1 = qi01 * r0 + qi11 * r1
            # E[r r'] = P_{i+1} + Fn P_i Fn' - C Fn' - Fn C' + r r'
            FP00 = Ps00 + 2.0 * f01 * Ps01 + f01 * f01 * Ps11
            FP01 = f11 * (Ps01 + f01 * Ps11)
            FP11 = f11 * f11 * Ps11
            CF00 = C00 + f01 * C01
            CF01 = f11 * C01
            CF10 = C10 + f01 * C11
            CF11 = f11 * C11
            E00 = Ps1_00 + FP00 - 2.0 * CF00 + r0 * r0
            E01 = Ps1_01 + FP01 - CF01 - CF10 + r0 * r1
            E11 = Ps1_11 + FP11 - 2.0 * CF11 + r1 * r1
            # Qbar = 0.5 (Qinv Errt Qinv - Qinv)
            A00 = qi00 * E00 + qi01 * E01
            A01 = qi00 * E01 + qi01 * E11
            A10 = qi01 * E00 + qi11 * E01
            A11 = qi01 * E01 + qi11 * E11
            Qb00 = 0.5 * ((A00 * qi00 + A01 * qi01) - qi00)
            Qb01 = 0.5 * ((A00 * qi01 + A01 * qi11) - qi01)
            Qb11 = 0.5 * ((A10 * qi01 + A11 * qi11) - qi11)

            # ---- par -> (F, Q, c) chain rule, all closed-form ----
            u = w["u"]
            e1 = w["e1"]
            m1 = w["m1"]
            ue1 = u * e1
            # d/d(log tau): g = tau*em1, e1' = u e1; q terms carry the
            # tau powers of sigma2/beta^k; phi' = em1^2, psi' = em1
            dg = w["g"] - w["dtv"] * e1
            dq00 = 2.0 * w["uq00"] - w["s3"] * u * m1 * m1
            dq01 = w["uq01"] - 2.0 * w["s2"] * m1 * ue1
            dq11 = -2.0 * w["s1"] * ue1 * e1
            dbp = w["bp"] - w["dtv"] * m1
            # q01 feeds BOTH off-diagonal Q entries in the primal -> 2x
            ltb = (Fb01 * dg + Fb11 * ue1
                   + Qb00 * dq00 + 2.0 * Qb01 * dq01 + Qb11 * dq11
                   + (cb0 * dbp - cb1 * ue1) * w["m"])
            # all Q entries scale as nu^2
            lnb = 2.0 * (Qb00 * w["uq00"] + 2.0 * Qb01 * w["uq01"]
                         + Qb11 * w["uq11"])
            mub = cb0 * w["bp"] + cb1 * w["bv"]

            cot[l, 0] = TVn * mub
            cot[l, 1] = TVn * ltb
            cot[l, 2] = TVn * lnb

            # obs + prior score at i (gbar scaling applied outside)
            U = ins.upd[l]
            R = ins.rst[l]
            resid = ins.y[l] - ms0
            cot[l, 3] = U * (-resid / h) + R * (-resid / p0_pos)
            Ey2 = resid * resid + Ps00
            ha = ha + U * (0.5 * Ey2 / (h * h) - 0.5 / h)

        new = _pack_sm(acc)
        for i in range(_N_SM):
            car[i][...] = new[i]
        hacc[...] = ha

        @pl.when(lc == n_lc - 1)
        def _():
            hbar_out[...] = hacc[...]

    outs = pl.pallas_call(
        score_kernel,
        grid=grid,
        in_specs=[h_spec, rev_spec, mf_spec] + [tot_spec] * _N_SM,
        out_specs=[cot_spec, tot_spec],
        out_shape=(
            jax.ShapeDtypeStruct((L_pad, 4, MID, 128), dtype),
            jax.ShapeDtypeStruct((MID, 128), dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((8, 128), dtype)] * _N_SM
            + [pltpu.VMEM((8, 128), dtype)]
        ),
        interpret=_interpret(),
    )(h_arr, tiles, m_f, *excl_tiles)

    c_mu, c_lt, c_ln, c_y = _unstack_tiles(
        outs[0], d, n, NB, L, L_pad, MID
    )
    mubar = gbar * c_mu  # (d, n)
    ltbar = gbar * jnp.sum(c_lt, axis=0)  # (n,)
    lnbar = gbar * jnp.sum(c_ln, axis=0)
    ybar = gbar * c_y
    hbar = gbar * jnp.sum(outs[1])
    return mubar, ltbar, lnbar, ybar, hbar
