"""Monte Carlo path updates, batched over the walker ensemble.

Each reference move subroutine (vpi_mod.f90) becomes a pure function
`(key, paths, ...) -> (paths', accepted)` over the full ensemble
`paths[W, M, N, D]` — explicit batch, not vmap, so the hot pair kernels see
the whole [W, B, N] tensors and can be routed to fused Pallas kernels.

Structural redesign vs the reference (see SURVEY.md §7):
  * The staging *free-particle* reconstruction is a cheap `lax.scan` over the
    window (the recursion is inherently sequential, vpi_mod.f90:531-533), but
    the expensive part — the per-bead interaction Delta-S (UpdateAction) —
    is hoisted out of the loop and evaluated for the whole window in ONE
    batched pair kernel (ops/pairwise.py).  This is exact because the other
    particles are frozen during a single-particle move.
  * Tail-type moves reuse the head-type machinery on the bead-reversed
    segment: the free-particle bridge construction and the Chin weights are
    symmetric under time reversal (M-1-ib keeps bead parity since 2*Nb is
    even), so the flipped move generates the identical distribution.
  * Variable window lengths (random Ls, vpi_mod.f90:601) use a static
    buffer of Lmax beads with inactive beads proposing xnew == xold, whose
    Delta-S contribution is exactly zero — no masking epsilon anywhere.
  * Staging windows are drawn on EVEN start beads (the reference draws any
    start, vpi_mod.f90:498).  Any state-independent window distribution
    preserves detailed balance; even alignment keeps the bisection levels'
    midpoint parities static and every window's Delta-S is ONE fused
    all-bead pair kernel with ib-derived Chin weights
    (ops/pairwise.delta_action_rows).

Randomness: one threefry key per move site, with per-walker independence
coming from array-shaped draws — reproducible and order-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..system import System, Tables
from ..utils.pbc import wrap
from .pairwise import delta_action, delta_action_sum


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------

def metropolis(key, dS):
    """Metropolis accept for action change dS[W] (vpi_mod.f90:356-364)."""
    u = jax.random.uniform(key, jnp.shape(dS), jnp.result_type(dS))
    return u < jnp.exp(-dS)


def metropolis_u(u, dS):
    """Metropolis accept from a PRE-DRAWN uniform (the batched-randoms hot
    path: one big draw per sweep iteration instead of ~20 small key-derive
    + draw kernels — the per-move threefry plumbing measured ~31 us of the
    ~88 us best-W move budget)."""
    return u < jnp.exp(-dS)


def _mi(system: System, x):
    """Single-image wrap of a displacement (identity under a trap)."""
    if system.pbc:
        return wrap(x, system.geo.Lbox)
    return x


def _wrap_pos(system: System, x):
    """BoundaryConditions equivalent for absolute positions."""
    if system.pbc:
        return wrap(x, system.geo.Lbox)
    return x


def get_chain(paths, ip):
    """Worldlines of particle(s) ip: [W, M, D].  ip scalar or [W].

    The per-walker form (the worm particle) is a one-hot CONTRACTION, not a
    gather: TPU gathers/scatters with per-row indices serialize, while the
    one-hot dot streams paths once at full HBM bandwidth (a ~15 ms/move ->
    ~0.5 ms/move difference at W=4096, docs/VALIDATION.md 'Performance')."""
    ip = jnp.asarray(ip)
    if ip.ndim == 0:
        return paths[:, :, ip, :]
    onehot = (jnp.arange(paths.shape[2]) == ip[:, None]).astype(paths.dtype)
    return jnp.einsum("wmnd,wn->wmd", paths, onehot)


def set_chain(paths, ip, chain):
    """Write chains [W, M, D] back into paths at particle(s) ip.

    Per-walker ip uses a one-hot select (single fused elementwise pass over
    paths) instead of an XLA scatter — see get_chain."""
    ip = jnp.asarray(ip)
    if ip.ndim == 0:
        return paths.at[:, :, ip, :].set(chain)
    sel = (jnp.arange(paths.shape[2])[None, :] == ip[:, None])  # [W, N]
    return jnp.where(sel[:, None, :, None], chain[:, :, None, :], paths)


def _slice_beads(arr, ii, L: int):
    """Window of L beads starting at ii along axis 1 (walker axis 0).

    ii scalar (shared window, the default — see _window_start): a plain
    dynamic slice, the cheapest possible form.

    ii [W] (per-walker windows): one batched gather — NOT
    vmap(dynamic_slice): per-element start indices defeat dynamic-slice
    batching and XLA lowers that to a serialized W-iteration while loop
    (measured ~2.2 ms/move at W=512 vs ~10 us for the gather form)."""
    if jnp.ndim(ii) == 0:
        return lax.dynamic_slice_in_dim(arr, ii, L, axis=1)
    idx = ii[:, None] + jnp.arange(L)                  # [W, L]
    idx = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
    return jnp.take_along_axis(arr, idx, axis=1)


def _update_beads(chain, ii, seg):
    """Write the bead window back (inverse of _slice_beads)."""
    if jnp.ndim(ii) == 0:
        return lax.dynamic_update_slice_in_dim(chain, seg, ii, axis=1)
    W, L = seg.shape[0], seg.shape[1]
    idx = ii[:, None] + jnp.arange(L)                  # [W, L]
    return chain.at[jnp.arange(W)[:, None], idx].set(seg)



def _win_chain(Rw, ip, dtype):
    """Moved particle's beads out of a partner WINDOW Rw [W, B, N, D].

    ip scalar: a plain slice.  ip [W]: one-hot contraction over the window
    only (contracting the full paths costs a whole-array pass per move)."""
    ip = jnp.asarray(ip)
    if ip.ndim == 0:
        return Rw[:, :, ip, :]
    onehot = (jnp.arange(Rw.shape[2]) == ip[:, None]).astype(dtype)
    return jnp.einsum("wbnd,wn->wbd", Rw, onehot)


def _win_write(paths, lo, Rw, ip, seg):
    """Write the moved particle's window beads back (inverse of _win_chain):
    a window-sized masked select + one dynamic-update-slice of paths."""
    ip = jnp.asarray(ip)
    if ip.ndim == 0:
        return lax.dynamic_update_slice(
            paths, seg[:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), jnp.asarray(lo, jnp.int32),
             jnp.asarray(ip, jnp.int32), jnp.int32(0)))
    sel = (jnp.arange(paths.shape[2])[None, :] == ip[:, None])  # [W, N]
    blk = jnp.where(sel[:, None, :, None], seg[:, :, None, :], Rw)
    return lax.dynamic_update_slice(
        paths, blk.astype(paths.dtype),
        (jnp.int32(0), jnp.asarray(lo, jnp.int32), jnp.int32(0),
         jnp.int32(0)))


def _window_start(system: System, key, W: int, n_opts: int):
    """Random even-aligned window offset: 2 * U{0 .. n_opts-1}.

    Default (cfg.shared_windows): ONE offset per move site, shared by every
    walker.  The window position is a state-independent proposal parameter,
    so each walker's Markov kernel is the exact reference mixture
    (vpi_mod.f90:498 draws it per move for its single walker) — sharing only
    correlates WHICH window different walkers touch in the same iteration,
    not their proposals or accepts.  Perf: a scalar offset turns the window
    slice/write-back into dynamic slices; per-walker offsets force gathers
    and full-layout copies of paths every iteration (~10x slower at W=512).

    cfg.shared_windows=False draws per-walker offsets (reference-exact
    walker independence, for statistics studies)."""
    shape = () if system.cfg.shared_windows else (W,)
    return 2 * jax.random.randint(key, shape, 0, n_opts, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Brownian-bridge tables: the staging recursion as one matmul
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bridge_tables(Lmax: int, dt: float):
    """Unroll the staging recursion (vpi_mod.f90:531-533) into a linear map.

    The recursion  x_j = a_j x_{j-1} + b_j anchor + s_j g_j  with
    a_j=(L-j)/(L-j+1), b_j=1/(L-j+1), s_j=sqrt((L-j)/(L-j+1) dt)  composes to

        x_j = (1 - j/L) start + (j/L) anchor + sum_k T_L[j,k] g_k,

    i.e. the exact free-particle (Brownian) bridge, with T_L the implied
    Cholesky factor of the bridge covariance:
    T_L[j,k] = s_k * prod_{i=k+1..j} a_i  (1 <= k <= j <= L-1).

    On TPU this turns the inherently sequential per-bead scan — the latency
    bottleneck of every regrow move, and ~60%% of flagship step time in the
    worm sweep — into ONE batched matmul consuming the same gaussians in the
    same order (bitwise-equivalent distribution; fp-level agreement with the
    scan is tested in tests/test_sampler.py).

    Returns (T[Lmax+1, Lmax-1, Lmax-1], w[Lmax+1, Lmax-1]) as float64 numpy,
    indexed by the segment length Ls; w[L, j-1] = j/L (anchor mean weight),
    rows j >= L are zero.
    """
    J = Lmax - 1
    T = np.zeros((Lmax + 1, J, J))
    w = np.zeros((Lmax + 1, J))
    for L in range(2, Lmax + 1):
        a = np.ones(L)       # a[j] for j=1..L-1 at index j
        s = np.zeros(L)
        for j in range(1, L):
            a[j] = (L - j) / (L - j + 1.0)
            s[j] = np.sqrt((L - j) / (L - j + 1.0) * dt)
        for j in range(1, L):
            w[L, j - 1] = j / L
            acc = s[j]
            T[L, j - 1, j - 1] = acc
            for k in range(j - 1, 0, -1):
                # T[j,k] = s_k * prod_{i=k+1..j} a_i, built right-to-left
                T[L, j - 1, k - 1] = s[k] * np.prod(a[k + 1:j + 1])
    return T, w


# ---------------------------------------------------------------------------
# The segment-regrow workhorse
# ---------------------------------------------------------------------------

def segment_regrow(system: System, tables: Tables, key, seg, R_seg, ib_seg,
                   ip, Ls, first_mode: str, first_w, first_pos=None,
                   start_parity=None, fixed_L=None, fold=None,
                   fold_sub=(0, 1)):
    """Regrow path segments in 'head orientation', whole ensemble at once.

    seg:    [W, Lb+1, D] bead positions (index 0 = the end being regrown,
            index Ls = the fixed anchor; beads beyond Ls untouched)
    R_seg:  [W, Lb+1, N, D] all particles at the segment's beads
    ib_seg: [W, Lb+1] true bead indices (drive Chin weights / end-WF terms)
    Ls:     [W] active segment lengths (2 <= Ls <= Lb)
    first_mode: 'gauss' — free-gaussian guess for bead 0 with
                  sigma = sqrt(Ls*dt) (MoveHead, vpi_mod.f90:619-645);
                'pin'   — set bead 0 := first_pos (CloseChain / Swap);
                'fixed' — keep bead 0 (interior Staging).
    first_w: weight multiplying the first bead's Delta-S (0.5 for the worm
             central bead, vpi_mod.f90:1573-1577; 0.0 for Swap's pin).
    start_parity: ignored (kept for API stability; the Chin weights come
             from the traced ib_seg — see ops/pairwise.delta_action_rows).
    fixed_L: static int when every walker's Ls equals it (interior staging)
             — selects the single-matrix bridge matmul.
    fold:    force-field cache rows under the ODD beads of the window's
             displaced rows 0..Lb-1 (rows fold_sub[0]::fold_sub[1]),
             switching the F^2 term to the cached exact form; returns the
             odd-row cache increment as an extra output.

    Beads 1..Ls-1 are rebuilt by the exact staging recursion
    (vpi_mod.f90:509-549) toward the anchor; the interaction Delta-S of the
    whole window — INCLUDING the first bead, weighted first_w — is one
    batched pair kernel over rows 0..Lb-1.

    Returns (seg_new, dS[W]) (+ dfield with fold).
    """
    cfg = system.cfg
    dt = cfg.dt
    W, Lbp1, D = seg.shape
    Lb = Lbp1 - 1
    dtype = seg.dtype
    k_first, k_stag = jax.random.split(key)

    Ls = jnp.asarray(Ls, jnp.int32)
    # per-walker anchor bead via one-hot contraction (per-row gathers
    # serialize on TPU; see get_chain)
    oh_ls = (jnp.arange(Lbp1) == Ls[:, None]).astype(dtype)      # [W, Lb+1]
    anchor = jnp.einsum("wld,wl->wd", seg, oh_ls)                # [W, D]
    xold0 = seg[:, 0]

    if first_mode == "gauss":
        g = jax.random.normal(k_first, (W, D), dtype)
        xmid = xold0 - _mi(system, xold0 - anchor)  # unwrap anchor near xold0
        sigma = jnp.sqrt(Ls.astype(dtype) * dt)[:, None]
        xnew0 = _wrap_pos(system, xmid + sigma * g)
    elif first_mode == "pin":
        xnew0 = jnp.asarray(first_pos, dtype)
    elif first_mode == "fixed":
        xnew0 = xold0
    else:
        raise ValueError(first_mode)

    # staging reconstruction of beads 1..Ls-1
    xolds = seg[:, 1:Lb]  # [W, Lb-1, D]
    gs = jax.random.normal(k_stag, (Lb - 1, W, D), dtype)

    if cfg.regrow == "bridge":
        # one-matmul Brownian bridge (see _bridge_tables): distributionally
        # identical to the scan, no sequential latency, rides the MXU
        Tnp, wnp = _bridge_tables(Lb, dt)
        g = gs.swapaxes(0, 1)                          # [W, Lb-1, D]
        xdiff = -_mi(system, xnew0 - anchor)           # start -> anchor image
        if fixed_L is not None:
            # all walkers share one static length: single-matrix matmul
            T1 = jnp.asarray(Tnp[fixed_L], dtype)      # [J, J]
            wgt = jnp.asarray(wnp[fixed_L], dtype)[None, :]
            z = jnp.einsum("jk,wkd->wjd", T1, g)
        else:
            # per-walker bridge matrices via one-hot matmul (an [Ls] row
            # gather of [J, J] blocks serializes on TPU)
            oh = oh_ls[:, : Tnp.shape[0]]              # [W, Lb+1]
            J = Tnp.shape[1]
            T = jnp.einsum(
                "wl,lx->wx", oh,
                jnp.asarray(Tnp, dtype).reshape(Tnp.shape[0], J * J)
            ).reshape(-1, J, J)                        # [W, J, J]
            wgt = jnp.einsum("wl,lj->wj", oh, jnp.asarray(wnp, dtype))
            z = jnp.einsum("wjk,wkd->wjd", T, g)
        mean = xnew0[:, None, :] + wgt[:, :, None] * xdiff[:, None, :]
        xnews = _wrap_pos(system, mean + z)
        act = (jnp.arange(1, Lb)[None, :] < Ls[:, None])[:, :, None]
        xnews = jnp.where(act, xnews, xolds)
    else:
        # sequential scan form (the reference's literal recursion,
        # vpi_mod.f90:509-549; kept for parity/regression testing)
        def body(prev_new, inp):
            j, g, xold_j = inp
            active = (j < Ls)[:, None]
            nrem = jnp.maximum(Ls - j, 1).astype(dtype)[:, None]
            xprev = xold_j + _mi(system, prev_new - xold_j)
            xnext = xold_j - _mi(system, xold_j - anchor)
            sigma = jnp.sqrt(nrem / (nrem + 1.0) * dt)
            xmid = (xnext + xprev * nrem) / (nrem + 1.0)
            xnew_j = _wrap_pos(system, xmid + sigma * g)
            xnew_j = jnp.where(active, xnew_j, xold_j)
            return xnew_j, xnew_j

        _, xnews = lax.scan(body, xnew0,
                            (jnp.arange(1, Lb), gs, xolds.swapaxes(0, 1)))
        xnews = xnews.swapaxes(0, 1)  # [W, Lb-1, D]

    # one pair pass over ALL displaced rows 0..Lb-1; the first bead's whole
    # contribution carries first_w (worm-center 1/2, vpi_mod.f90:1573-1577;
    # 0 for Swap's pin), the bridge rows weight 1.  need_wf only when the
    # window can reach a chain end (first_mode regrows bead 0/2Nb or the
    # caller's window covers one — interior 'fixed' windows never do).
    # a ZERO-weighted first row (Swap's pin, vpi_mod.f90:2388-2436) is
    # excluded from the evaluation entirely: the pin position coincides
    # EXACTLY with the worm particle's bead (not the moved particle's, so
    # notself keeps the pair) and the singular 1/r would poison the row sum
    # with 0 * inf = NaN
    x0_eval = xold0 if first_w == 0.0 else xnew0
    xnew_all = jnp.concatenate([x0_eval[:, None], xnews], axis=1)
    xold_all = jnp.concatenate([xold0[:, None], xolds], axis=1)
    rw = None
    if first_w not in (0.0, 1.0):
        rw = jnp.ones((Lb,), dtype).at[0].set(first_w)
    # only 'gauss' callers regrow windows that can reach a chain end (head/
    # tail moves); 'fixed'/'pin' windows displace strictly interior beads
    need_wf = first_mode == "gauss"
    out = delta_action_sum(
        system, tables, R_seg[:, :Lb], xnew_all, xold_all, ip,
        ib_seg[..., :Lb], fold=fold, fold_sub=fold_sub, need_wf=need_wf,
        row_weights=rw)

    seg_new = seg.at[:, 0].set(xnew0).at[:, 1:Lb].set(xnews)
    if fold is not None:
        dS, dfield = out
        return seg_new, dS, dfield
    return seg_new, out


# ---------------------------------------------------------------------------
# Rigid translations (TranslateChain, vpi_mod.f90:313-379)
# ---------------------------------------------------------------------------

def translate_chain(system: System, tables: Tables, key, paths, ip, active,
                    delta, fodd=None):
    """Rigid CM displacement of one particle's whole worldline (ensemble).

    fodd [W, Nb, N, D] (optional): odd-bead force-field cache — routes the
    F^2 part of the acceptance through the exact cached form and returns
    the updated cache (see ops/pairwise.delta_action_rows)."""
    M = system.M
    W = paths.shape[0]
    D = system.cfg.dim
    k_dx, k_acc = jax.random.split(key)
    dx = delta * (2.0 * jax.random.uniform(k_dx, (W, 1, D), paths.dtype) - 1.0)
    chain = get_chain(paths, ip)                     # [W, M, D]
    xnew = _wrap_pos(system, chain + dx)
    ib = jnp.broadcast_to(jnp.arange(M), (W, M))
    out = delta_action_sum(system, tables, paths, xnew, chain, ip, ib,
                           start_parity=0, fold=fodd, fold_sub=(1, 2))
    if fodd is not None:
        dS, dfield = out  # odd rows 1,3,..,M-2 = the entire odd cache
        acc = metropolis(k_acc, dS) & active
        fodd = fodd + jnp.where(acc[:, None, None, None], dfield, 0.0)
    else:
        acc = metropolis(k_acc, out) & active
    chain_new = jnp.where(acc[:, None, None], xnew, chain)
    paths = set_chain(paths, ip, chain_new)
    if fodd is not None:
        return paths, fodd, acc
    return paths, acc


def translate_half_chain(system: System, tables: Tables, key, paths, xend,
                         ip, half: int, active, delta, fodd=None):
    """Rigid displacement of one worm half (vpi_mod.f90:383-476).

    Bead Nb is first pinned to xend[half] (the pin persists even on
    rejection, as in the reference, vpi_mod.f90:400-402) — ACTIVE walkers
    only (see _pin_center).
    half static: 1 -> beads [0..Nb], 2 -> beads [Nb..2Nb].
    fodd: force-field cache (returned updated as 3rd-from-last output).
    """
    cfg = system.cfg
    Nb, D = cfg.Nb, cfg.dim
    W = paths.shape[0]
    k_dx, k_acc = jax.random.split(key)
    lo, hi = (0, Nb + 1) if half == 1 else (Nb, 2 * Nb + 1)
    if fodd is not None:
        # write the pin into paths (cache must see the pinned config)
        paths, fodd = _pin_center(system, paths, xend, ip, half, active,
                                  tables, fodd)
        Rw = paths[:, lo:hi]
        xold = _win_chain(Rw, ip, paths.dtype)
    else:
        Rw = paths[:, lo:hi]
        cur = _win_chain(Rw, ip, paths.dtype)
        pin = jnp.where(active[:, None], xend[:, half - 1], cur[:, Nb - lo])
        xold = cur.at[:, Nb - lo].set(pin)
    ib = jnp.broadcast_to(jnp.arange(lo, hi), (W, hi - lo))
    dx = delta * (2.0 * jax.random.uniform(k_dx, (W, 1, D), paths.dtype) - 1.0)
    xnew = _wrap_pos(system, xold + dx)
    if fodd is not None:
        f_seg, sub, k0 = _codd_window(fodd, lo, lo % 2, hi - lo)
        dS, dfield = delta_action_sum(system, tables, Rw, xnew, xold, ip,
                                      ib, fold=f_seg, fold_sub=sub)
    else:
        dS = delta_action_sum(system, tables, Rw, xnew, xold, ip, ib)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], xnew, xold)  # pin persists
    xend = xend.at[:, half - 1].set(
        jnp.where(active[:, None], seg_fin[:, Nb - lo], xend[:, half - 1]))
    paths = _win_write(paths, lo, Rw, ip, seg_fin)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k0)
        return paths, xend, fodd, acc
    return paths, xend, acc


# ---------------------------------------------------------------------------
# Staging moves (Staging, vpi_mod.f90:480-578)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Odd-bead force-field cache plumbing (exact Chin F^2, cfg.exact_f2+f2_cache)
#
# The Chin action's F^2 term carries weight ONLY on odd interior beads
# (global_mod.f90:33-46; ops/pairwise.chin_weights), so the cache `codd`
# holds the per-particle force field at odd beads only: codd[W, Nb, N, D]
# with row k <-> bead 2k+1.  Every window's odd beads map to a CONTIGUOUS
# cache-row range (windows are even-aligned), so cache slicing stays
# dynamic-slice-shaped, and even-bead-only kernels (most bisection levels,
# the chain-end gates) skip cache traffic entirely.
# ---------------------------------------------------------------------------

def _codd_window(codd, lo, par: int, B: int):
    """Cache rows under the odd beads of forward window rows 0..B-1 at
    beads lo..lo+B-1.  `par` is the STATIC parity of lo (lo itself may be
    traced — window starts are even-aligned so parity is static).

    Returns (f [W, mo, N, D], (r0, 2), k0): window rows r0::2 are the odd
    beads, living at cache rows k0..k0+mo-1 in the same order."""
    r0 = (par + 1) % 2
    mo = (B - r0 + 1) // 2
    k0 = (lo + r0) // 2               # python int or traced scalar/[W]
    return _slice_beads(codd, k0, mo), (r0, 2), k0


def _codd_window_rev(codd, hi: int, par: int, B: int):
    """Reversed-window variant: rows 0..B-1 at beads hi, hi-1, ..., hi-B+1.
    Returns (f, (r0, 2), k_lo) with f row-aligned to the reversed window's
    odd rows (beads descending); write back f_new[::-1] at cache row
    k_lo."""
    r0 = (par + 1) % 2
    mo = (B - r0 + 1) // 2
    k_first = (hi - r0) // 2          # cache row of bead hi - r0
    k_lo = k_first - mo + 1
    return _slice_beads(codd, k_lo, mo)[:, ::-1], (r0, 2), k_lo


def _cache_win_write(codd, f_seg, dfield, acc, k0, reverse=False):
    """Cache write-back: add the acc-gated odd-row increments to the hoisted
    cache rows and write them back at cache row k0 (scalar: one DUS;
    per-walker k0: batched scatter — mirrors the paths write-back forms).
    dfield rows align with f_seg rows; reverse=True un-reverses a
    reversed-orientation window before writing (tail-type moves).
    THE one cache write-back helper — every move-side variant routes here
    (bisection.py included)."""
    f_new = f_seg + jnp.where(acc[:, None, None, None], dfield, 0.0)
    if reverse:
        f_new = f_new[:, ::-1]
    if jnp.ndim(k0) == 0:
        return jax.lax.dynamic_update_slice_in_dim(codd, f_new, k0, axis=1)
    W = codd.shape[0]
    idx = k0[:, None] + jnp.arange(f_seg.shape[1])
    return codd.at[jnp.arange(W)[:, None], idx].set(f_new)


def staging_move(system: System, tables: Tables, key, paths, ip, active,
                 L: int, fodd=None):
    """Interior staging over a random even-aligned window of L links.

    fodd [W, M, N, D] (optional): all-bead force-field cache (exact Chin
    F^2; see ops/pairwise.delta_action_rows) — hoisted as one contiguous
    window, written back with one dynamic-update-slice."""
    M = system.M
    W = paths.shape[0]
    k_ii, k_reg, k_acc = jax.random.split(key, 3)
    ii = _window_start(system, k_ii, W, (M - 1 - L) // 2 + 1)
    R_seg = _slice_beads(paths, ii, L + 1)
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.expand_dims(ii, -1) + jnp.arange(L + 1)
    Ls = jnp.full((W,), L, jnp.int32)
    if fodd is not None:
        f_seg, sub, k0 = _codd_window(fodd, ii, 0, L)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "fixed", 1.0,
            fixed_L=L, fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "fixed", 1.0,
            fixed_L=L)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    if jnp.ndim(ii) == 0 and jnp.ndim(jnp.asarray(ip)) == 0:
        paths = _win_write(paths, ii, R_seg, ip, seg_fin)
    else:
        chain = get_chain(paths, ip)
        chain = _update_beads(chain, ii, seg_fin)
        paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k0)
        return paths, fodd, acc
    return paths, acc


def _pin_center(system: System, paths, xend, ip, half: int, active,
                tables: Tables = None, fodd=None):
    """Pin bead Nb of particle ip to xend[half] — ACTIVE walkers only.

    The reference pins inside its isopen worm branch (vpi_mod.f90:1400-1406);
    for closed walkers xend is stale and writing it would corrupt the path
    (a detailed-balance violation caught in round 4).

    fodd: force-field cache — the pin IS a configuration change at bead Nb
    (unconditional: it persists on rejection), so its one-row field
    increment is applied unconditionally too.  Returns (paths[, fodd])."""
    Nb = system.cfg.Nb
    Rrow = paths[:, Nb: Nb + 1]
    cur = _win_chain(Rrow, ip, paths.dtype)[:, 0]
    pin = jnp.where(active[:, None], xend[:, half - 1], cur)
    paths = _win_write(paths, Nb, Rrow, ip, pin[:, None, :])
    if fodd is not None:
        if Nb % 2 == 0:
            # the odd-bead cache never stores bead Nb when it is even —
            # its F^2 carries zero Chin weight, so the pin is cache-free
            return paths, fodd
        from .pairwise import delta_pot_cached
        k = (Nb - 1) // 2
        _, _, dfield = delta_pot_cached(
            system, tables, Rrow, pin[:, None], cur[:, None], ip,
            fodd[:, k: k + 1])
        fodd = lax.dynamic_update_slice_in_dim(
            fodd, fodd[:, k: k + 1] + dfield, k, axis=1)
        return paths, fodd
    return paths


def staging_half_chain(system: System, tables: Tables, key, paths, xend,
                       ip, half: int, active, L: int, fodd=None):
    """Staging confined to one worm half (vpi_mod.f90:1376-1491)."""
    cfg = system.cfg
    Nb = cfg.Nb
    W = paths.shape[0]
    k_ii, k_reg, k_acc = jax.random.split(key, 3)
    base = 0 if half == 1 else Nb
    ii = base + _window_start(system, k_ii, W, (Nb - L) // 2 + 1)
    # pin bead Nb := xend first (persists even on rejection,
    # vpi_mod.f90:1400-1406); interior staging never displaces it (windows
    # live inside one half, Nb can only be a window ENDPOINT), so xend is
    # unchanged by this move
    if fodd is not None:
        paths, fodd = _pin_center(system, paths, xend, ip, half, active,
                                  tables, fodd)
    else:
        paths = _pin_center(system, paths, xend, ip, half, active)
    R_seg = _slice_beads(paths, ii, L + 1)
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.expand_dims(ii, -1) + jnp.arange(L + 1)
    Ls = jnp.full((W,), L, jnp.int32)
    if fodd is not None:
        f_seg, sub, k0 = _codd_window(fodd, ii, base % 2, L)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "fixed", 1.0,
            fixed_L=L, fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "fixed", 1.0,
            fixed_L=L)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    if jnp.ndim(ii) == 0:
        paths = _win_write(paths, ii, R_seg, ip, seg_fin)
    else:
        chain = get_chain(paths, ip)
        chain = _update_beads(chain, ii, seg_fin)
        paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k0)
        return paths, xend, fodd, acc
    return paths, xend, acc


# ---------------------------------------------------------------------------
# Head / tail open-end moves (MoveHead/MoveTail, vpi_mod.f90:582-860)
# ---------------------------------------------------------------------------

def _rand_ls(key, W, Lmax: int):
    """Ls = int((Lmax-1)*u)+2 in [2, Lmax] (vpi_mod.f90:601)."""
    return jax.random.randint(key, (W,), 0, Lmax - 1, dtype=jnp.int32) + 2


def move_head(system: System, tables: Tables, key, paths, ip, active,
              Lmax: int, fodd=None):
    """Regrow the first Ls beads from a free-gaussian guess for bead 0."""
    W = paths.shape[0]
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, W, Lmax)
    R_seg = paths[:, : Lmax + 1]
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.broadcast_to(jnp.arange(Lmax + 1), (W, Lmax + 1))
    if fodd is not None:
        f_seg, sub, k0 = _codd_window(fodd, 0, 0, Lmax)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0,
            fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    paths = _win_write(paths, 0, R_seg, ip, seg_fin)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k0)
        return paths, fodd, acc
    return paths, acc


def move_tail(system: System, tables: Tables, key, paths, ip, active,
              Lmax: int, fodd=None):
    """Mirror of move_head at the far end, via the bead-reversed segment."""
    M = system.M
    W = paths.shape[0]
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, W, Lmax)
    R_seg = paths[:, M - 1 - Lmax:][:, ::-1]
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.broadcast_to(jnp.arange(M - 1, M - 2 - Lmax, -1),
                              (W, Lmax + 1))
    if fodd is not None:
        f_seg, sub, k_lo = _codd_window_rev(fodd, M - 1, 0, Lmax)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0,
            fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0)
    acc = metropolis(k_acc, dS) & active
    seg_fin0 = jnp.where(acc[:, None, None], seg_new, seg)
    seg_fin = seg_fin0[:, ::-1]
    paths = _win_write(paths, M - 1 - Lmax, R_seg[:, ::-1], ip, seg_fin)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k_lo, reverse=True)
        return paths, fodd, acc
    return paths, acc


def fused_end_stagings(system: System, tables: Tables, key, paths, ip,
                       active, Lmax: int, fodd=None):
    """MoveHead + MoveTail of one particle as ONE composite update.

    The two end windows (beads 0..Lmax-1 and M-Lmax..M-1) are disjoint and
    non-adjacent whenever 2*Lmax < M-1 (caller-guaranteed), so the action
    has no direct coupling between their displaced coordinates and the
    joint proposal with independent Metropolis accepts is a valid product
    kernel (see ops/bisection.py fused-composite note; invariance-tested in
    tests/test_invariance.py).

    Implementation: the tail segment is bead-reversed into head orientation
    and stacked along the walker axis, so ONE ensemble-doubled
    segment_regrow call (one bridge matmul + one batched window Delta-S)
    regrows both ends — ~2x fewer sequential pair kernels than running the
    two moves back-to-back, with twice the rows per kernel.

    Returns (paths, acc_head[W], acc_tail[W]).
    """
    M = system.M
    W = paths.shape[0]
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, 2 * W, Lmax)  # independent head/tail lengths
    chain = get_chain(paths, ip)
    seg = jnp.concatenate(
        [chain[:, : Lmax + 1], chain[:, M - 1 - Lmax:][:, ::-1]], axis=0)
    R_seg = jnp.concatenate(
        [paths[:, : Lmax + 1], paths[:, M - 1 - Lmax:][:, ::-1]], axis=0)
    ib_seg = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(Lmax + 1), (W, Lmax + 1)),
        jnp.broadcast_to(jnp.arange(M - 1, M - 2 - Lmax, -1), (W, Lmax + 1)),
    ], axis=0)
    if fodd is not None:
        # odd-bead cache rows under each window's DISPLACED beads
        # (0..Lmax-1 head, M-1..M-Lmax tail in reversed segment order)
        f_head, sub, k_h = _codd_window(fodd, 0, 0, Lmax)
        f_tail, _, k_t = _codd_window_rev(fodd, M - 1, 0, Lmax)
        fold = jnp.concatenate([f_head, f_tail], axis=0)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0,
            fold=fold, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0)
    acc2 = metropolis(k_acc, dS) & jnp.concatenate([active, active])
    seg_fin = jnp.where(acc2[:, None, None], seg_new, seg)
    chain = chain.at[:, : Lmax + 1].set(seg_fin[:W])
    chain = chain.at[:, M - 1 - Lmax:].set(seg_fin[W:, ::-1])
    paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_head, dfield[:W], acc2[:W], k_h)
        fodd = _cache_win_write(fodd, f_tail, dfield[W:], acc2[W:], k_t,
                                reverse=True)
        return paths, fodd, acc2[:W], acc2[W:]
    return paths, acc2[:W], acc2[W:]


def move_head_half_chain(system: System, tables: Tables, key, paths, xend,
                         ip, half: int, active, Lmax: int, fodd=None):
    """MoveHeadHalfChain (vpi_mod.f90:1495-1656): half=1 regrows from bead 0,
    half=2 from the central bead Nb (with the half-weight 1/2 on its dS)."""
    cfg = system.cfg
    Nb = cfg.Nb
    W = paths.shape[0]
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, W, Lmax)
    lo = 0 if half == 1 else Nb
    w0 = 1.0 if half == 1 else 0.5
    if fodd is not None:
        paths, fodd = _pin_center(system, paths, xend, ip, half, active,
                                  tables, fodd)
    else:
        paths = _pin_center(system, paths, xend, ip, half, active)
    R_seg = paths[:, lo: lo + Lmax + 1]
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.broadcast_to(lo + jnp.arange(Lmax + 1), (W, Lmax + 1))
    if fodd is not None:
        f_seg, sub, k0 = _codd_window(fodd, lo, lo % 2, Lmax)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0,
            fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    paths = _win_write(paths, lo, R_seg, ip, seg_fin)
    # half=2 regrows FROM the center: an accepted move updates xend
    if half == 2:
        xend = xend.at[:, half - 1].set(
            jnp.where(active[:, None], seg_fin[:, 0], xend[:, half - 1]))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k0)
        return paths, xend, fodd, acc
    return paths, xend, acc


def move_tail_half_chain(system: System, tables: Tables, key, paths, xend,
                         ip, half: int, active, Lmax: int, fodd=None):
    """MoveTailHalfChain (vpi_mod.f90:1660-1817): half=1 regrows the central
    bead Nb (weight 1/2), half=2 the last bead 2*Nb."""
    cfg = system.cfg
    Nb, M = cfg.Nb, system.M
    W = paths.shape[0]
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, W, Lmax)
    hi = Nb if half == 1 else 2 * Nb  # bead being regrown (segment end)
    w0 = 0.5 if half == 1 else 1.0
    lo = hi - Lmax
    if fodd is not None:
        paths, fodd = _pin_center(system, paths, xend, ip, half, active,
                                  tables, fodd)
    else:
        paths = _pin_center(system, paths, xend, ip, half, active)
    R_seg = paths[:, lo: hi + 1][:, ::-1]
    seg = _win_chain(R_seg, ip, paths.dtype)
    ib_seg = jnp.broadcast_to(jnp.arange(hi, lo - 1, -1), (W, Lmax + 1))
    if fodd is not None:
        f_seg, sub, k_lo = _codd_window_rev(fodd, hi, hi % 2, Lmax)
        seg_new, dS, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0,
            fold=f_seg, fold_sub=sub)
    else:
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    paths = _win_write(paths, lo, R_seg[:, ::-1], ip, seg_fin[:, ::-1])
    # half=1 regrows the CENTER bead: an accepted move updates xend
    if half == 1:
        xend = xend.at[:, half - 1].set(
            jnp.where(active[:, None], seg_fin[:, 0], xend[:, half - 1]))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k_lo, reverse=True)
        return paths, xend, fodd, acc
    return paths, xend, acc
