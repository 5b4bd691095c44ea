import jax
import jax.numpy as jnp
import numpy as np

from gs_init_tpu.ops.projection import (
    covariance_3d,
    project_gaussians,
    quat_to_rotmat,
)
from gs_init_tpu.ops.sh import eval_sh_bases, num_sh_bases, sh_to_color


def test_quat_to_rotmat_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
    r = quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_identity_quat():
    r = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)


def test_covariance_psd(rng):
    q = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.1, 2.0, size=(16, 3)), jnp.float32)
    cov = covariance_3d(q, s)
    eig = np.linalg.eigvalsh(np.asarray(cov))
    assert (eig > 0).all()
    # Eigenvalues are the squared scales.
    np.testing.assert_allclose(
        np.sort(eig, axis=-1), np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-3
    )


def _simple_camera(width=64, height=48, f=60.0):
    K = jnp.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    return viewmat[None], K[None]


def test_project_center_gaussian():
    viewmats, Ks = _simple_camera()
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    opac = jnp.array([0.9])
    p = project_gaussians(means, quats, scales, opac, viewmats, Ks, 64, 48)
    np.testing.assert_allclose(p.means2d[0, 0], [32.0, 24.0], atol=1e-4)
    np.testing.assert_allclose(p.depths[0, 0], 2.0, atol=1e-6)
    assert p.radii[0, 0] > 0
    # Isotropic gaussian: conic b-term ~ 0, a == c.
    np.testing.assert_allclose(p.conics[0, 0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(p.conics[0, 0, 0], p.conics[0, 0, 2], rtol=1e-5)


def test_project_culling():
    viewmats, Ks = _simple_camera()
    means = jnp.array(
        [
            [0.0, 0.0, -1.0],  # behind camera
            [100.0, 0.0, 2.0],  # far outside frustum
            [0.0, 0.0, 2.0],  # visible
        ]
    )
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
    scales = jnp.full((3, 3), 0.05)
    opac = jnp.full((3,), 0.9)
    p = project_gaussians(means, quats, scales, opac, viewmats, Ks, 64, 48)
    assert p.radii[0, 0] == 0
    assert p.radii[0, 1] == 0
    assert p.radii[0, 2] > 0


def test_project_alive_mask():
    viewmats, Ks = _simple_camera()
    means = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (2, 1))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.05)
    opac = jnp.full((2,), 0.9)
    alive = jnp.array([True, False])
    p = project_gaussians(
        means, quats, scales, opac, viewmats, Ks, 64, 48, alive=alive
    )
    assert p.radii[0, 0] > 0 and p.radii[0, 1] == 0


def test_antialiased_compensation():
    viewmats, Ks = _simple_camera()
    means = jnp.array([[0.0, 0.0, 20.0]])  # tiny on screen -> strong blur
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.01)
    opac = jnp.array([0.9])
    p_c = project_gaussians(means, quats, scales, opac, viewmats, Ks, 64, 48)
    p_aa = project_gaussians(
        means, quats, scales, opac, viewmats, Ks, 64, 48, antialiased=True
    )
    assert p_aa.opacities[0, 0] < p_c.opacities[0, 0]


def test_sh_num_bases():
    for d, n in [(0, 1), (1, 4), (2, 9), (3, 16)]:
        assert num_sh_bases(d) == n
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        assert eval_sh_bases(d, dirs).shape == (1, n)


def test_sh_degree0_constant(rng):
    dirs = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    sh = jnp.zeros((10, 16, 3)).at[:, 0, :].set(1.0)
    c = sh_to_color(sh, dirs, degree=0)
    np.testing.assert_allclose(c, 0.28209479 + 0.5, atol=1e-5)
    # Higher active degree with zero coeffs changes nothing.
    c3 = sh_to_color(sh, dirs, degree=3)
    np.testing.assert_allclose(c, c3, atol=1e-6)


def test_sh_grad_flows():
    sh = jnp.ones((4, 16, 3)) * 0.3
    dirs = jnp.array([[0.0, 0.0, 1.0]] * 4)
    g = jax.grad(lambda s: sh_to_color(s, dirs, 3).sum())(sh)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
