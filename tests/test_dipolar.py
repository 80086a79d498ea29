"""2-D dipolar Bose gas (BASELINE.json stretch config #5) — end-to-end.

Runs the N=256 dipolar gas through the production Driver on the fake
8-device (dp=4, tp=2) mesh — the particle count the tensor-parallel pair
axis exists for — and checks the physics and the sharding equivalence.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dipolar_jastrow_cancels_core():
    """The dipolar2d Jastrow is the zero-energy 1/r^3 two-body solution:
    |u'|^2 == Rm/r^3 cancels the potential's divergence in the local
    energy (with Rm = Cdd), and u''+u'/r is the subleading r^-5/2 term."""
    import jax.numpy as jnp

    from pathintegralgroundstate_tpu.models import jastrow as jas

    r = jnp.asarray([0.03, 0.1, 0.5, 1.7])
    Rm = 1.0
    u, du, d2u = (jas.dipolar_u(Rm, r), jas.dipolar_du(Rm, r),
                  jas.dipolar_d2u(Rm, r))
    np.testing.assert_allclose(np.asarray(du ** 2),
                               np.asarray(Rm / r ** 3), rtol=1e-12)
    # 2-D radial laplacian of u: u'' + u'/r = -1/2 sqrt(Rm) r^-5/2
    np.testing.assert_allclose(np.asarray(d2u + du / r),
                               np.asarray(-0.5 * np.sqrt(Rm)
                                          * np.asarray(r) ** -2.5),
                               rtol=1e-12)
    # finite-difference consistency
    h = 1e-6
    fd = (np.asarray(jas.dipolar_u(Rm, r + h))
          - np.asarray(jas.dipolar_u(Rm, r - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(du), fd, rtol=1e-6)


@pytest.mark.slow
def test_dipolar_n256_tp_mesh_end_to_end(tmp_path):
    from tools.dipolar2d import build_cfg, run

    cfg = build_cfg(Nblock=2, mesh_walkers=4, mesh_pairs=2)
    drv, acc = run(cfg, str(tmp_path / "tp"), burnin=2)
    nb = acc["diag_bl"]
    E = acc["AvE"] / nb / cfg.Np
    Et = acc["AvEt"] / nb / cfg.Np
    gr = acc["AvGr"] / nb
    assert np.isfinite(E) and np.isfinite(Et)
    assert E > 0 and Et > 0  # purely repulsive gas
    # dipolar correlation hole; pair correlation normalized at long range
    assert gr[0] < 0.05 and gr[1] < 0.5, gr[:5]
    assert abs(np.mean(gr[-10:]) - 1.0) < 0.4, gr[-10:]

    # sharded == unsharded (same seed): the tp axis does real work without
    # changing the physics
    cfg1 = build_cfg(Nblock=2)
    drv1, acc1 = run(cfg1, str(tmp_path / "one"), burnin=2)
    np.testing.assert_allclose(acc["AvE"], acc1["AvE"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(acc["AvGr"]),
                               np.asarray(acc1["AvGr"]), rtol=1e-8)
