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


def test_extents_bound_level_set():
    """The elliptical per-axis extents (used by tile binning) must (a) never
    exceed the bounding-circle radius, (b) still contain the full n-sigma
    level set of the blurred covariance — the marginal bound argument in
    projection.py. Verified against a dense numpy sweep of boundary points."""
    rng = np.random.default_rng(3)
    n = 256
    means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.exp(rng.normal(-2.5, 0.9, (n, 3))).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(1.0, 0.5, n)))).astype(np.float32)
    K = np.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1]], np.float32)
    view = np.eye(4, dtype=np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(view)[None], jnp.asarray(K)[None],
        256, 192,
    )
    radii = np.asarray(proj.radii[0])
    ext = np.asarray(proj.extents[0])
    conic = np.asarray(proj.conics[0])
    op = np.asarray(proj.opacities[0])
    live = radii > 0
    assert live.any()
    # (a) per-axis extents never exceed the circle radius
    assert (ext[live] <= radii[live, None]).all()
    # (b) for each live gaussian, points ON the n-sigma ellipse lie inside
    # the [-ext_x, ext_x] x [-ext_y, ext_y] box (ceil gives the slack).
    theta = np.linspace(0, 2 * np.pi, 64)
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    # invert conic -> covariance
    det = a * c - b * b
    cov = np.stack([c / det, -b / det, a / det], 1)  # xx, xy, yy
    nsig = np.minimum(3.0, np.sqrt(2 * np.log(np.maximum(op * 255.0, 1.0001))))
    for i in np.nonzero(live)[0][:64]:
        Sig = np.array([[cov[i, 0], cov[i, 1]], [cov[i, 1], cov[i, 2]]])
        L = np.linalg.cholesky(Sig)
        pts = nsig[i] * (L @ np.stack([np.cos(theta), np.sin(theta)]))
        assert (np.abs(pts[0]) <= ext[i, 0] + 1e-3).all()
        assert (np.abs(pts[1]) <= ext[i, 1] + 1e-3).all()
    # anisotropy means the box should be strictly tighter somewhere
    assert (ext[live] < radii[live, None]).any()


def test_extents_shrink_pair_count():
    """Elliptical binning must produce fewer (never more) pairs than the
    bounding circle and identical pallas-vs-oracle renders (coverage parity
    is exercised by the rasterize tests; here just the count invariant)."""
    from gs_init_tpu.ops.tiles import bin_gaussians

    rng = np.random.default_rng(5)
    n = 4096
    means = rng.normal(0, 1.3, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.exp(rng.normal(-2.8, 0.8, (n, 3))).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(0.5, 1, n)))).astype(np.float32)
    K = np.array([[300.0, 0, 192], [0, 300.0, 128], [0, 0, 1]], np.float32)
    view = np.eye(4, dtype=np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(view)[None], jnp.asarray(K)[None],
        384, 256,
    )
    cap = 1 << 18
    pc = int(bin_gaussians(
        proj.means2d, proj.radii, proj.depths, 384, 256, 32, cap
    ).tile_starts[-1])
    pe = int(bin_gaussians(
        proj.means2d, proj.radii, proj.depths, 384, 256, 32, cap,
        extents=proj.extents,
    ).tile_starts[-1])
    assert 0 < pe < pc
