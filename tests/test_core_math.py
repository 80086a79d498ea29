"""Unit tests for the numerics substrate: PBC, potentials, Jastrow, Chin
weights, interpolation, special functions (SURVEY.md §4 test plan)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from pathintegralgroundstate_tpu.models import jastrow as jas
from pathintegralgroundstate_tpu.models.potentials import get_potential
from pathintegralgroundstate_tpu.ops.action import (
    chin_weights, chin_weights_thermo, green_function)
from pathintegralgroundstate_tpu.utils import special
from pathintegralgroundstate_tpu.utils.interpolate import build_table, interpolate
from pathintegralgroundstate_tpu.utils.pbc import minimum_image, wrap


# --- PBC (pbc_mod.f90) ------------------------------------------------------

def test_wrap_single_image():
    L = (10.0, 8.0, 6.0)
    x = jnp.array([5.2, -4.1, 2.9])
    out = wrap(x, L)
    np.testing.assert_allclose(out, [5.2 - 10.0, -4.1 + 8.0, 2.9], rtol=1e-14)


def test_minimum_image_matches_reference_semantics():
    # scalar reference implementation of MinimumImage (pbc_mod.f90:29-52)
    L = np.array([3.0, 4.0, 5.0])
    rng = np.random.default_rng(0)
    xij = rng.uniform(-1.4, 1.4, size=(100, 3)) * L
    ref = xij.copy()
    for k in range(3):
        ref[:, k] = np.where(ref[:, k] > L[k] / 2, ref[:, k] - L[k], ref[:, k])
        ref[:, k] = np.where(ref[:, k] < -L[k] / 2, ref[:, k] + L[k], ref[:, k])
    out, r2 = minimum_image(jnp.asarray(xij), L)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r2, (ref ** 2).sum(-1), rtol=1e-12, atol=1e-12)


# --- Potentials (system_mod.f90) -------------------------------------------

def _aziz2_scalar(r):
    # direct transcription of the Aziz II formulas (system_mod.f90:136-182)
    E0, rm = 10.948, 2.963
    A, alpha, beta = 1.8443101e5, 10.43329537, -2.27965105
    C6, C8, C10, D = 1.36745214, 0.42123807, 0.17473318, 1.4826
    V0 = E0 / 1.85505153154686
    d = r * 2.556 / rm
    H = math.exp(-(D / d - 1.0) ** 2) if d <= D else 1.0
    return V0 * (A * math.exp(-alpha * d + beta * d * d)
                 - (C6 + C8 / d**2 + C10 / d**4) * H / d**6)


def test_aziz2_values():
    pot = get_potential("aziz2")
    rs = np.array([0.6, 0.8, 1.0, 1.1594, 1.5, 2.0, 3.0])
    got = np.asarray(pot.v(jnp.asarray(rs)))
    want = np.array([_aziz2_scalar(r) for r in rs])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_aziz2_well_depth():
    # HFD-B(HE) well: ~ -10.95 K at r ~ rm=2.963 A (= 1.159 sigma)
    pot = get_potential("aziz2")
    r = jnp.linspace(0.9, 1.6, 20001)
    v = pot.v(r)
    vmin = float(jnp.min(v))
    rmin = float(r[int(jnp.argmin(v))])
    assert abs(vmin - (-10.948 / 1.85505153154686)) < 2e-3
    assert abs(rmin - 2.963 / 2.556) < 1e-3


@pytest.mark.parametrize("name", ["aziz2", "aziz1", "soft", "dipolar"])
def test_potential_derivative_vs_fd(name):
    pot = get_potential(name)
    r = jnp.linspace(0.7, 2.4, 57)
    h = 1e-6
    fd = (pot.v(r + h) - pot.v(r - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(pot.dvdr(r)), np.asarray(fd),
                               rtol=2e-6, atol=1e-8)


# --- Jastrow (system_mod.f90:38-66) ----------------------------------------

def test_mcmillan_derivatives():
    Rm = 1.2
    r = jnp.linspace(0.7, 3.0, 31)
    h = 1e-5
    du_fd = (jas.mcmillan_u(Rm, r + h) - jas.mcmillan_u(Rm, r - h)) / (2 * h)
    d2u_fd = (jas.mcmillan_u(Rm, r + h) - 2 * jas.mcmillan_u(Rm, r)
              + jas.mcmillan_u(Rm, r - h)) / h**2
    np.testing.assert_allclose(jas.mcmillan_du(Rm, r), du_fd, rtol=1e-7)
    np.testing.assert_allclose(jas.mcmillan_d2u(Rm, r), d2u_fd,
                               rtol=1e-3, atol=1e-6)
    # exact reference forms (opt=1, opt=2)
    np.testing.assert_allclose(jas.mcmillan_du(Rm, r), 2.5 * (Rm / r) ** 5 / r)
    np.testing.assert_allclose(jas.mcmillan_d2u(Rm, r), -15.0 * (Rm / r) ** 5 / r**2)


def test_trap_terms():
    a = (1.5, 2.0)
    x = jnp.array([0.3, -0.7])
    np.testing.assert_allclose(
        jas.trap_psi(a, x), -0.5 * ((0.3 / 1.5) ** 2 + (0.7 / 2.0) ** 2), rtol=1e-14)
    np.testing.assert_allclose(
        jas.trap_pot(a, x), 0.5 * (0.3**2 / 1.5**4 + 0.7**2 / 2.0**4), rtol=1e-14)
    np.testing.assert_allclose(jas.trap_psi_grad(a, x), [-0.3 / 1.5**2, 0.7 / 2.0**2])
    np.testing.assert_allclose(jas.trap_pot_grad(a, x), [0.3 / 1.5**4, -0.7 / 2.0**4])


# --- Chin action weights (global_mod.f90:19-72) ----------------------------

def _green_ref(opt, ib, Nb, dt, Pot, F2):
    """Scalar transcription of GreenFunction (global_mod.f90:19-72)."""
    if opt == 0:
        Ve, Vc = Pot, Pot + dt**2 * F2 / 6.0
        if ib in (0, 2 * Nb):
            return dt * Ve / 3.0
        return 2.0 * dt * Ve / 3.0 if ib % 2 == 0 else 4.0 * dt * Vc / 3.0
    dVe, dVc = Pot, Pot + dt**2 * F2 / 2.0
    if ib in (0, 2 * Nb):
        return dVe / 3.0
    return 2.0 * dVe / 3.0 if ib % 2 == 0 else 4.0 * dVc / 3.0


@pytest.mark.parametrize("opt", [0, 1])
def test_green_function_matches_reference(opt):
    Nb, dt = 8, 5e-3
    M = 2 * Nb + 1
    Pot, F2 = 1.7, 0.9
    ib = jnp.arange(M)
    got = green_function(opt, ib, M, dt, Pot, F2)
    want = [_green_ref(opt, i, Nb, dt, Pot, F2) for i in range(M)]
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_chin_weight_vectors():
    Nb, dt = 8, 5e-3
    M = 2 * Nb + 1
    Pot, F2 = 1.3, 2.1
    wv, wf = chin_weights(M, dt, jnp.float64)
    via_weights = wv * Pot + wf * F2
    want = [_green_ref(0, i, Nb, dt, Pot, F2) for i in range(M)]
    np.testing.assert_allclose(via_weights, want, rtol=1e-14)
    wv, wf = chin_weights_thermo(M, dt, jnp.float64)
    via_weights = wv * Pot + wf * F2
    want = [_green_ref(1, i, Nb, dt, Pot, F2) for i in range(M)]
    np.testing.assert_allclose(via_weights, want, rtol=1e-14)


def test_chin_weights_sum():
    # Simpson weights must integrate a constant exactly: sum(wv) = 2*Nb*dt
    Nb, dt = 16, 3e-3
    wv, _ = chin_weights(2 * Nb + 1, dt, jnp.float64)
    np.testing.assert_allclose(float(jnp.sum(wv)), 2 * Nb * dt, rtol=1e-12)


# --- Interpolation (interpolate.f90) ---------------------------------------

def _interp_ref(opt, N, dx, F, x):
    """Scalar transcription of interpolate.f90 (with clamped indices)."""
    ix = int(x / dx) + 1
    ix = min(max(ix, 2), N)
    aux1 = x - (ix - 1) * dx
    aux2 = dx - aux1
    if opt == 0:
        return (aux1 * F[ix] + aux2 * F[ix - 1]) / dx
    if opt == 1:
        fb = (aux1 * F[ix - 1] + aux2 * F[ix - 2]) / dx
        fa = (aux1 * F[ix + 1] + aux2 * F[ix]) / dx
        return 0.5 * (fa - fb) / dx
    fb = (aux1 * F[ix - 1] + aux2 * F[ix - 2]) / dx
    fc = (aux1 * F[ix] + aux2 * F[ix - 1]) / dx
    fa = (aux1 * F[ix + 1] + aux2 * F[ix]) / dx
    return (fa - 2.0 * fc + fb) / (dx * dx)


def test_interpolate_matches_reference_stencil():
    N = 500
    rmax = 5.0
    table, dx = build_table(lambda r: jnp.sin(r) + 0.1 * r * r, rmax, N)
    Fnp = np.asarray(table)
    xs = np.linspace(0.05, rmax - 3 * dx, 113)
    for opt in (0, 1, 2):
        got = np.asarray(interpolate(opt, dx, table, jnp.asarray(xs)))
        want = np.array([_interp_ref(opt, N, dx, Fnp, x) for x in xs])
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_interpolate_derivative_accuracy():
    # the stencil's derivatives should converge to the true ones
    N = 20000
    rmax = 4.0
    table, dx = build_table(jnp.sin, rmax, N)
    xs = jnp.linspace(1.0, 3.0, 23)
    d1 = interpolate(1, dx, table, xs)
    d2 = interpolate(2, dx, table, xs)
    np.testing.assert_allclose(np.asarray(d1), np.cos(xs), atol=5e-4)
    np.testing.assert_allclose(np.asarray(d2), -np.sin(xs), atol=5e-2)


def test_jastrow_table_ghost_cells():
    # JastrowTable: WF(0)=WF(2), WF(Nmax+1)=WF(Nmax) (vpi_mod.f90:108-109)
    table, dx = build_table(lambda r: jnp.exp(-r), 3.0, 100)
    assert table.shape == (102,)
    assert table[0] == table[2]
    assert table[101] == table[100]
    np.testing.assert_allclose(float(table[5]), math.exp(-4 * dx), rtol=1e-12)


# --- Special functions (r8_gamma.f90, bessel_mod.f90) ----------------------

def test_gamma_vs_scipy():
    xs = np.array([0.5, 1.0, 1.5, 2.5, 3.0, 7.2, -0.5, -1.5])
    got = np.asarray(special.gamma(jnp.asarray(xs)))
    np.testing.assert_allclose(got, sps.gamma(xs), rtol=1e-10)


@pytest.mark.parametrize("fn,ref", [
    (special.bessj0, lambda x: sps.jv(0, x)),
    (special.bessj1, lambda x: sps.jv(1, x)),
    (special.bessi0, lambda x: sps.iv(0, x)),
    (special.bessi1, lambda x: sps.iv(1, x)),
])
def test_bessel_j_i_01(fn, ref):
    xs = np.array([0.1, 0.5, 1.0, 2.0, 3.7, 5.0, 9.0, 12.0])
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(xs))), ref(xs),
                               rtol=2e-6, atol=2e-7)


@pytest.mark.parametrize("fn,ref", [
    (special.bessy0, lambda x: sps.yv(0, x)),
    (special.bessy1, lambda x: sps.yv(1, x)),
    (special.bessk0, lambda x: sps.kv(0, x)),
    (special.bessk1, lambda x: sps.kv(1, x)),
])
def test_bessel_y_k_01(fn, ref):
    xs = np.array([0.1, 0.5, 1.0, 2.0, 3.7, 5.0, 9.0])
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(xs))), ref(xs),
                               rtol=3e-6, atol=3e-7)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_bessel_orders(n):
    xs = np.array([0.2, 1.0, 2.5, 4.0, 7.0, 11.0])
    np.testing.assert_allclose(np.asarray(special.bessj(n, jnp.asarray(xs))),
                               sps.jv(n, xs), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(special.bessi(n, jnp.asarray(xs))),
                               sps.iv(n, xs), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(special.bessk(n, jnp.asarray(xs))),
                               sps.kv(n, xs), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(special.bessy(n, jnp.asarray(xs))),
                               sps.yv(n, xs), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", ["aziz2", "aziz1", "soft", "dipolar", "none"])
def test_fused_v_dv_consistent(name):
    pot = get_potential(name)
    r = jnp.linspace(0.7, 2.4, 57)
    try:
        v2, dv2 = pot.v_dv(r, 1.0 / r)
    except TypeError:
        v2, dv2 = pot.v_dv(r)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(pot.v(r)),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(pot.dvdr(r)),
                               rtol=1e-10, atol=1e-12)
