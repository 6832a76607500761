"""V3 component-SoA vector algebra."""

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.core.vec import V3, lerp, reflect


def v(x, y, z):
    return V3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def as_np(a: V3):
    return np.array([float(a.x), float(a.y), float(a.z)])


def test_algebra():
    a, b = v(1, 2, 3), v(4, 5, 6)
    np.testing.assert_allclose(as_np(a + b), [5, 7, 9])
    np.testing.assert_allclose(as_np(a - b), [-3, -3, -3])
    np.testing.assert_allclose(as_np(a * 2.0), [2, 4, 6])
    np.testing.assert_allclose(as_np(2.0 * a), [2, 4, 6])
    np.testing.assert_allclose(as_np(a * b), [4, 10, 18])
    np.testing.assert_allclose(float(a.dot(b)), 32.0)
    np.testing.assert_allclose(as_np(a.cross(b)), [-3, 6, -3])
    np.testing.assert_allclose(as_np(-a), [-1, -2, -3])


def test_normalize_and_length():
    a = v(3, 4, 0)
    assert float(a.length()) == 5.0
    np.testing.assert_allclose(as_np(a.normalize()), [0.6, 0.8, 0.0], rtol=1e-6)


def test_reflect():
    # 45-degree incidence on the y=0 plane (WGSL reflect semantics).
    d = v(1, -1, 0).normalize()
    n = v(0, 1, 0)
    r = reflect(d, n)
    np.testing.assert_allclose(as_np(r), as_np(v(1, 1, 0).normalize()), atol=1e-6)


def test_lerp_matches_wgsl_mix():
    a, b = v(1, 1, 1), v(0.5, 0.7, 1.0)
    np.testing.assert_allclose(as_np(lerp(a, b, 0.0)), [1, 1, 1])
    np.testing.assert_allclose(as_np(lerp(a, b, 1.0)), [0.5, 0.7, 1.0], rtol=1e-6)
    np.testing.assert_allclose(as_np(lerp(a, b, 0.5)), [0.75, 0.85, 1.0], rtol=1e-6)


def test_where_and_pytree():
    import jax

    a = V3(jnp.arange(4.0), jnp.arange(4.0) + 10, jnp.arange(4.0) + 20)
    b = V3.zeros((4,))
    m = jnp.array([True, False, True, False])
    w = V3.where(m, a, b)
    np.testing.assert_allclose(np.asarray(w.x), [0, 0, 2, 0])
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 3  # V3 is a flat pytree of its components
