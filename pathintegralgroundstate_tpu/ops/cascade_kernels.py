"""Whole-move Pallas cascade kernels — one kernel per composite update.

Round-3 profiling (docs/VALIDATION.md 'Performance') showed the sequential
Metropolis chain is not pair-arithmetic bound: each composite move spent
~4 ms at W=4096 in a tail of ~25 small XLA ops around five tiny pair
kernels — worldline extraction forcing a full layout copy of `paths`
(~0.6 ms), per-level window slicing, RNG plumbing, masked updates.  These
kernels run the ENTIRE move — end-gate, every bisection level's midpoint
proposal, both Metropolis sides, the per-level accept gates, and the final
dead-walker revert — inside one `pallas_call`:

  * the partner windows are the only HBM input (channel-split planes
    [W, S, L+1, N], a cheap bead-range slice of paths);
  * the moved particle's own worldline is extracted IN-KERNEL by a one-hot
    dot over the partner lane axis (it is column ip of the window), so
    `get_chain`'s whole-array layout copy disappears;
  * randomness is packed OUTSIDE into two arrays (threefry, one normal and
    one uniform block per move site) and consumed positionally, keeping
    the counter-based RNG reproducibility story;
  * the Chin weights per level are STATIC (even-aligned windows: a level's
    midpoints share one parity — finest level odd, the rest even interior;
    only an end-gate row carries the trial-WF term).

Every kernel has a jnp twin (`interpret`-free, same packed randoms, built
on ops/pairwise.delta_action_rows) used on CPU/fallback and as the
bit-equivalence reference in tests/test_cascade.py.

Modes (all slots independent product-kernel factors, see ops/bisection.py):
  ends     — head + tail bisection cascades of one particle (S = 2; the
             tail window is passed bead-reversed, "head orientation")
  interior — K disjoint interior windows of K distinct particles (S = K)
  rigid    — whole-chain rigid translation of one particle (S = 1,
             window = all M beads, one gate)   [TranslateChain]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..system import System, Tables

TILE_W = 128


def _chin_row_w(system: System, pos: int, is_end_window: bool):
    """Static Chin opt=0 weights of a displaced row at window position pos
    (global bead parity == pos parity: windows are even-aligned and the
    reversed tail keeps parity since M-1 is even)."""
    dt = system.cfg.dt
    if pos == 0 and is_end_window:
        return dt / 3.0, 0.0, 1.0          # chain end: wv, wf, wpsi
    if pos % 2 == 1:
        return 4.0 * dt / 3.0, 2.0 * dt ** 3 / 9.0, 0.0
    return 2.0 * dt / 3.0, 0.0, 0.0


def _wrap_k(system: System, x, k: int, dtype):
    if not system.pbc:
        return x
    L = jnp.asarray(system.geo.Lbox[k], dtype)
    half = jnp.asarray(0.5 * system.geo.Lbox[k], dtype)
    x = jnp.where(x > half, x - L, x)
    x = jnp.where(x < -half, x + L, x)
    return x


def _row_pass(system: System, xn_k, xo_k, R_k, notself, wv, wf, wpsi,
              dtype):
    """Both Metropolis sides of one displaced row vs its partner plane.

    xn_k/xo_k: [TW] per dim; R_k: [TW, N] per dim.  Returns dS [TW].
    """
    geo = system.geo

    def side(x_k):
        r2 = None
        dxs = []
        for k in range(len(R_k)):
            dx = _wrap_k(system, x_k[k][:, None] - R_k[k], k, dtype)
            dxs.append(dx)
            r2 = dx * dx if r2 is None else r2 + dx * dx
        r2s = jnp.where(notself, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
        m = notself & (r2 <= jnp.asarray(geo.rcut2, dtype)) \
            if system.pbc else notself
        mf = m & (r2 > 0.0)
        try:
            v, dv = system.potential.v_dv(r, rinv)
        except TypeError:
            v, dv = system.potential.v_dv(r)
        pot = jnp.sum(jnp.where(m, v, 0.0), axis=1)
        f2 = jnp.zeros(pot.shape, dtype)
        if wf != 0.0:
            fr = jnp.where(mf, dv * rinv, 0.0)
            for k in range(len(R_k)):
                Fk = jnp.sum(fr * dxs[k], axis=1)
                f2 = f2 + Fk * Fk
        usum = jnp.zeros(pot.shape, dtype)
        if wpsi != 0.0:
            u = system.u(r)
            usum = jnp.sum(jnp.where(mf, u, 0.0), axis=1)
        return pot, f2, usum

    pot_n, f2_n, u_n = side(xn_k)
    pot_o, f2_o, u_o = side(xo_k)
    dS = wv * (pot_n - pot_o)
    if wf != 0.0:
        dS = dS + wf * (f2_n - f2_o)
    if wpsi != 0.0:
        dS = dS - wpsi * (u_n - u_o)
    return dS


def _cascade_body(system: System, mode: str, S: int, L: int, nlev: int,
                  *refs):
    """Kernel body.  refs:
      R_k x D       [TW, S, L+1, N]
      rg_k x D      [TW, S, L+1]    gaussians (pos-indexed; rigid: dx at 0)
      ru            [TW, S, G]      uniforms  (G accept gates)
      ip            [1, S] (SMEM)   per-slot moved particle
      act           [TW, S]         slot activity (f32 0/1)
    outs:
      segf_k x D    [TW, S, L+1]    final window positions
      acc           [TW, S]         accepted (f32 0/1)
    (assembled by iota-select: Mosaic supports neither concat-with-offset
    nor strided stores here)
    """
    D = system.cfg.dim
    dt = system.cfg.dt
    R_refs = refs[:D]
    rg_refs = refs[D:2 * D]
    ru_ref = refs[2 * D]
    ip_ref = refs[2 * D + 1]
    act_ref = refs[2 * D + 2]
    seg_refs = refs[2 * D + 3:3 * D + 3]
    acc_ref = refs[3 * D + 3]
    N = R_refs[0].shape[-1]
    dtype = R_refs[0].dtype
    TW = R_refs[0].shape[0]
    end_window = mode in ("ends", "rigid")

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1)
    slot_fin = []      # per slot: (accf [TW], [fin_k [TW, L+1]] x D)

    for s in range(S):
        ip_s = ip_ref[0, s]
        notself = iota_n != ip_s
        onehot = jnp.where(notself, 0.0, 1.0).astype(dtype)
        R_s = [R_refs[k][:, s] for k in range(D)]           # [TW, L+1, N]
        # the slot particle's own worldline = column ip of the window;
        # positions are kept as PYTHON LISTS of [TW] arrays (any in-kernel
        # array .at update lowers through the unsupported scatter)
        seg0a = [jnp.sum(R_s[k] * onehot[:, None, :], axis=2)
                 for k in range(D)]                         # [TW, L+1]
        seg0 = [[seg0a[k][:, p] for p in range(L + 1)] for k in range(D)]
        seg = [list(col) for col in seg0]
        alive = act_ref[:, s] > 0.0
        gate = 0

        if mode == "rigid":
            # rigid displacement of the whole window, one Metropolis gate
            dS = jnp.zeros((TW,), dtype)
            xnew = []
            for k in range(D):
                dx = rg_refs[k][:, s, 0]
                xk = [_wrap_k(system, seg[k][p] + dx, k, dtype)
                      for p in range(L + 1)]
                xnew.append(xk)
            for p in range(L + 1):
                # window = whole chain: ends at p = 0 and p = L
                wv, wf, wpsi = _chin_row_w(system, 0 if p == L else p, True)
                dS = dS + _row_pass(
                    system, [xnew[k][p] for k in range(D)],
                    [seg[k][p] for k in range(D)],
                    [R_s[k][:, p] for k in range(D)],
                    notself, wv, wf, wpsi, dtype)
            alive = alive & (ru_ref[:, s, 0] < jnp.exp(-dS))
            for k in range(D):
                seg[k] = list(xnew[k])
        else:
            if mode == "ends":
                # free-gaussian end guess with its own gate
                # (vpi_mod.f90:1039-1076)
                xn0 = []
                for k in range(D):
                    x0 = seg[k][0]
                    anc = seg[k][L]
                    xmid = x0 - _wrap_k(system, x0 - anc, k, dtype)
                    xn0.append(_wrap_k(
                        system,
                        xmid + jnp.sqrt(jnp.asarray(L * dt, dtype))
                        * rg_refs[k][:, s, 0], k, dtype))
                wv, wf, wpsi = _chin_row_w(system, 0, True)
                dS0 = _row_pass(system, xn0,
                                [seg[k][0] for k in range(D)],
                                [R_s[k][:, 0] for k in range(D)],
                                notself, wv, wf, wpsi, dtype)
                alive = alive & (ru_ref[:, s, 0] < jnp.exp(-dS0))
                for k in range(D):
                    seg[k][0] = xn0[k]
                gate = 1

            for ilev in range(1, nlev + 1):
                delta = 2 ** (nlev - ilev + 1)
                m = 2 ** (ilev - 1)
                d2 = delta // 2
                sigma = jnp.sqrt(jnp.asarray(0.25 * delta * dt, dtype))
                wv, wf, wpsi = _chin_row_w(system, d2, False)
                dS = jnp.zeros((TW,), dtype)
                xnew_rows = []
                for j in range(m):
                    p = d2 + j * delta
                    xn_row = []
                    for k in range(D):
                        xo = seg[k][p]
                        xp = xo + _wrap_k(
                            system, seg[k][p - d2] - xo, k, dtype)
                        xn = xo - _wrap_k(
                            system, xo - seg[k][p + d2], k, dtype)
                        xn_row.append(_wrap_k(
                            system, 0.5 * (xp + xn)
                            + sigma * rg_refs[k][:, s, p], k, dtype))
                    dS = dS + _row_pass(
                        system, xn_row, [seg[k][p] for k in range(D)],
                        [R_s[k][:, p] for k in range(D)],
                        notself, wv, wf, wpsi, dtype)
                    xnew_rows.append((p, xn_row))
                alive = alive & (ru_ref[:, s, gate + ilev - 1]
                                 < jnp.exp(-dS))
                for p, xn_row in xnew_rows:
                    for k in range(D):
                        seg[k][p] = xn_row[k]

        accf = jnp.where(alive, 1.0, 0.0).astype(dtype)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (TW, L + 1), 1)
        fins = []
        for k in range(D):
            fin = jnp.zeros((TW, L + 1), dtype)
            for p in range(L + 1):
                v = jnp.where(alive, seg[k][p], seg0[k][p])
                fin = jnp.where(iota_p == p, v[:, None], fin)
            fins.append(fin)
        slot_fin.append((accf, fins))

    # assemble the full outputs (iota-select over the slot axis)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (TW, S), 1)
    acc_all = jnp.zeros((TW, S), dtype)
    for s in range(S):
        acc_all = jnp.where(iota_s == s, slot_fin[s][0][:, None], acc_all)
    acc_ref[...] = acc_all
    iota_s3 = jax.lax.broadcasted_iota(jnp.int32, (TW, S, L + 1), 1)
    for k in range(D):
        out = jnp.zeros((TW, S, L + 1), dtype)
        for s in range(S):
            out = jnp.where(iota_s3 == s, slot_fin[s][1][k][:, None, :],
                            out)
        seg_refs[k][...] = out


def _n_gates(mode: str, nlev: int) -> int:
    if mode == "rigid":
        return 1
    return nlev + (1 if mode == "ends" else 0)


def _tile_w(mode: str, S: int, Lp1: int, N: int, D: int,
            nlev: int) -> int:
    """Largest walker tile fitting VMEM: double-buffered window channels
    (partner lanes pad to 128) plus the unrolled row-pass temporaries
    (~12 KB per pass per walker row, measured from Mosaic's scoped-vmem
    accounting)."""
    npad = -(-N // 128) * 128
    passes = Lp1 if mode == "rigid" else S * (2 ** max(nlev, 1))
    per_row = D * 2 * S * Lp1 * npad * 4 + passes * 12 * 1024
    for tw in (256, 128, 64, 32, 16, 8):
        if per_row * tw <= 10 * 2 ** 20:
            return tw
    return 8


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def cascade_pallas(system, mode: str, Rwin, rg, ru, ip_slots, nlev: int,
                   act):
    """Run one composite cascade move on TPU.

    Rwin [W, S, L+1, N, D]: partner windows (head orientation).
    rg   [W, S, L+1, D]: position-indexed gaussians (rigid: dx in row 0).
    ru   [W, S, G]: accept-gate uniforms.
    ip_slots [S] i32: moved particle per slot.
    act  [W, S] bool: slot activity.
    Returns (seg_fin [W, S, L+1, D], acc [W, S] bool).
    """
    W, S, Lp1, N, D = Rwin.shape
    L = Lp1 - 1
    dtype = Rwin.dtype
    G = _n_gates(mode, nlev)
    tw = _tile_w(mode, S, Lp1, N, D, nlev)
    Wp = ((W + tw - 1) // tw) * tw

    def padw(a):
        if Wp != W:
            a = jnp.pad(a, ((0, Wp - W),) + ((0, 0),) * (a.ndim - 1))
        return a

    ins = [padw(Rwin[..., k]) for k in range(D)]
    ins += [padw(rg[..., k]) for k in range(D)]
    ins.append(padw(ru))
    ins.append(jnp.asarray(ip_slots, jnp.int32).reshape(1, S))
    ins.append(padw(act.astype(dtype)))

    grid = (Wp // tw,)
    sp = lambda *shape: pl.BlockSpec(
        (tw,) + shape, lambda i, _n=len(shape): (i,) + (0,) * _n,
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_cascade_body, system, mode, S, L, nlev)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sp(S, Lp1, N)] * D + [sp(S, Lp1)] * D + [sp(S, G)]
        + [pl.BlockSpec((1, S), lambda i: (0, 0),
                        memory_space=pltpu.SMEM), sp(S)],
        out_specs=[sp(S, Lp1)] * D + [sp(S)],
        out_shape=[jax.ShapeDtypeStruct((Wp, S, Lp1), dtype)] * D
        + [jax.ShapeDtypeStruct((Wp, S), dtype)],
    )(*ins)
    seg_fin = jnp.stack([o[:W] for o in outs[:D]], axis=-1)
    acc = outs[D][:W] > 0.0
    return seg_fin, acc


def cascade_jnp(system: System, tables: Tables, mode: str, Rwin, rg, ru,
                ip_slots, nlev: int, act):
    """jnp twin of cascade_pallas: identical semantics and randoms (the
    CPU/fallback path, and the bit-equivalence reference for the kernel)."""
    from .pairwise import delta_action_rows

    W, S, Lp1, N, D = Rwin.shape
    L = Lp1 - 1
    dtype = Rwin.dtype
    dt = system.cfg.dt
    ip_slots = jnp.asarray(ip_slots, jnp.int32)

    onehot = (jnp.arange(N)[None, :] == ip_slots[:, None]).astype(dtype)
    seg0 = jnp.einsum("wsbnd,sn->wsbd", Rwin, onehot)
    seg = seg0
    alive = act

    def wrapv(x):
        if not system.pbc:
            return x
        Lb = jnp.asarray(system.geo.Lbox, dtype)
        half = 0.5 * Lb
        x = jnp.where(x > half, x - Lb, x)
        x = jnp.where(x < -half, x + Lb, x)
        return x

    # weight classes via representative bead indices (chin_weights only
    # looks at end-vs-interior and parity): 0 -> chain end, 1 -> odd
    # interior, 2 -> even interior (valid for any M > 4)
    gate = 0
    if mode == "rigid":
        dx = rg[:, :, 0:1, :]
        xnew = wrapv(seg + dx)
        pos = list(range(Lp1))
        ib_cls = [0 if p in (0, L) else (1 if p % 2 else 2) for p in pos]
        ib = jnp.broadcast_to(jnp.asarray(ib_cls, jnp.int32), (W, S * Lp1))
        out = delta_action_rows(
            system, tables, Rwin.reshape(W, S * Lp1, N, D),
            xnew.reshape(W, S * Lp1, D), seg.reshape(W, S * Lp1, D),
            jnp.broadcast_to(ip_slots[None, :, None],
                             (W, S, Lp1)).reshape(W, S * Lp1),
            ib, need_wf=True)
        dS = jnp.sum(out.reshape(W, S, Lp1), axis=-1)
        alive = alive & (ru[:, :, 0] < jnp.exp(-dS))
        seg = xnew
    else:
        if mode == "ends":
            x0 = seg[:, :, 0]
            anc = seg[:, :, L]
            xmid = x0 - wrapv(x0 - anc)
            xn0 = wrapv(xmid + jnp.sqrt(jnp.asarray(L * dt, dtype))
                        * rg[:, :, 0])
            ib = jnp.zeros((W, S), jnp.int32)       # chain-end class
            out = delta_action_rows(
                system, tables, Rwin[:, :, 0], xn0, x0,
                jnp.broadcast_to(ip_slots[None, :], (W, S)), ib,
                need_wf=True)
            alive = alive & (ru[:, :, 0] < jnp.exp(-out))
            seg = seg.at[:, :, 0].set(xn0)
            gate = 1
        for ilev in range(1, nlev + 1):
            delta = 2 ** (nlev - ilev + 1)
            m = 2 ** (ilev - 1)
            d2 = delta // 2
            sigma = jnp.sqrt(jnp.asarray(0.25 * delta * dt, dtype))
            xold = seg[:, :, d2::delta]
            xp = xold + wrapv(seg[:, :, 0:L:delta] - xold)
            xn = xold - wrapv(xold - seg[:, :, delta::delta])
            xnew = wrapv(0.5 * (xp + xn) + sigma * rg[:, :, d2::delta])
            cls = 1 if d2 % 2 else 2
            ib = jnp.full((W, S * m), cls, jnp.int32)
            out = delta_action_rows(
                system, tables,
                Rwin[:, :, d2::delta].reshape(W, S * m, N, D),
                xnew.reshape(W, S * m, D), xold.reshape(W, S * m, D),
                jnp.broadcast_to(ip_slots[None, :, None],
                                 (W, S, m)).reshape(W, S * m),
                ib, need_wf=False)
            dS = jnp.sum(out.reshape(W, S, m), axis=-1)
            alive = alive & (ru[:, :, gate + ilev - 1] < jnp.exp(-dS))
            from .bisection import _strided_set
            seg = _strided_set(seg, xnew, 2, d2, delta, L)

    seg_fin = jnp.where(alive[:, :, None, None], seg, seg0)
    return seg_fin, alive


# ---------------------------------------------------------------------------
# Composite-move wrappers (prep + dispatch + write-back)
# ---------------------------------------------------------------------------

def use_cascade_kernel(system: System) -> bool:
    """Kernel path: TPU backend, PBC, closed forms, reference-parity F^2
    (the exact-F^2 cache keeps the jnp composite path), no tp partition."""
    cfg = system.cfg
    return (cfg.use_pallas and system.pbc and not cfg.v_table
            and not cfg.wf_table and not cfg.exact_f2
            and system.tp_mesh is None
            and jax.default_backend() == "tpu")


def _dispatch(system, tables, mode, Rwin, rg, ru, ips, nlev, act):
    # 'rigid' (whole-chain window, M unrolled row passes) exceeds Mosaic's
    # scoped-VMEM stack at production M; its jnp twin already rides the
    # fused rows kernel (ops/pallas_kernels.pair_rows_pallas) for the pair
    # work, so only the dyadic cascades use the whole-move kernel.
    if mode != "rigid" and use_cascade_kernel(system):
        return cascade_pallas(system, mode, Rwin, rg, ru, ips, nlev, act)
    return cascade_jnp(system, tables, mode, Rwin, rg, ru, ips, nlev, act)


def fused_ends_cascade(system: System, tables: Tables, key, paths, ip,
                       active, nlev: int):
    """MoveHeadBisection + MoveTailBisection of one particle as ONE kernel
    (the cascade form of ops/bisection.fused_end_bisections; same composite
    validity argument).  Returns (paths, acc_head[W], acc_tail[W])."""
    M = system.M
    W = paths.shape[0]
    L = 2 ** nlev
    D = system.cfg.dim
    k_g, k_u = jax.random.split(key)
    head = paths[:, : L + 1]
    tail = paths[:, M - 1 - L:][:, ::-1]
    Rwin = jnp.stack([head, tail], axis=1)           # [W, 2, L+1, N, D]
    rg = jax.random.normal(k_g, (W, 2, L + 1, D), paths.dtype)
    ru = jax.random.uniform(k_u, (W, 2, nlev + 1), paths.dtype)
    act = jnp.broadcast_to(active[:, None], (W, 2))
    ip = jnp.asarray(ip, jnp.int32)
    ips = jnp.stack([ip, ip])
    seg_fin, acc = _dispatch(system, tables, "ends", Rwin, rg, ru, ips,
                             nlev, act)
    paths = paths.at[:, : L + 1, ip, :].set(seg_fin[:, 0])
    paths = paths.at[:, M - 1 - L:, ip, :].set(seg_fin[:, 1, ::-1])
    return paths, acc[:, 0], acc[:, 1]


def interior_cascade(system: System, tables: Tables, key, paths, ips,
                     active, nlev: int):
    """K disjoint interior bisection windows of K distinct particles as ONE
    kernel (the cascade form of ops/bisection.bisection_multi).
    active: [W] or [W, K].  Returns (paths, acc[W, K])."""
    from jax import lax

    M = system.M
    W = paths.shape[0]
    L = 2 ** nlev
    K = len(ips)
    span = K * L
    assert span <= M - 1
    D = system.cfg.dim
    k_s, k_g, k_u = jax.random.split(key, 3)
    n_shift = (M - 1 - span) // 2 + 1
    s = 2 * jax.random.randint(k_s, (), 0, n_shift, dtype=jnp.int32)
    R_big = lax.dynamic_slice_in_dim(paths, s, span + 1, axis=1)
    Rwin = jnp.stack(
        [R_big[:, k * L: (k + 1) * L + 1] for k in range(K)], axis=1)
    rg = jax.random.normal(k_g, (W, K, L + 1, D), paths.dtype)
    ru = jax.random.uniform(k_u, (W, K, nlev), paths.dtype)
    act = jnp.asarray(active)
    if act.ndim == 1:
        act = jnp.broadcast_to(act[:, None], (W, K))
    ips_arr = jnp.stack([jnp.asarray(p, jnp.int32) for p in ips])
    seg_fin, acc = _dispatch(system, tables, "interior", Rwin, rg, ru,
                             ips_arr, nlev, act)
    for k in range(K):
        upd = seg_fin[:, k, 1:L, None, :]
        paths = lax.dynamic_update_slice(
            paths, upd.astype(paths.dtype),
            (jnp.int32(0), s + k * L + 1, ips_arr[k], jnp.int32(0)))
    return paths, acc


def rigid_cascade(system: System, tables: Tables, key, paths, ip, active,
                  delta):
    """Rigid whole-chain translation of one particle as ONE kernel (the
    cascade form of ops/moves.translate_chain).  Returns (paths, acc[W])."""
    M = system.M
    W = paths.shape[0]
    D = system.cfg.dim
    k_dx, k_u = jax.random.split(key)
    dx = delta * (2.0 * jax.random.uniform(k_dx, (W, 1, 1, D), paths.dtype)
                  - 1.0)
    rg = jnp.concatenate(
        [dx, jnp.zeros((W, 1, M - 1, D), paths.dtype)], axis=2)
    ru = jax.random.uniform(k_u, (W, 1, 1), paths.dtype)
    Rwin = paths[:, None]                            # [W, 1, M, N, D]
    ip = jnp.asarray(ip, jnp.int32)
    seg_fin, acc = _dispatch(system, tables, "rigid", Rwin, rg, ru,
                             ip[None], 0, active[:, None])
    paths = paths.at[:, :, ip, :].set(seg_fin[:, 0])
    return paths, acc[:, 0]
