"""Gradient/conjugacy property tests for belief kernels.

The reference checks these identities with finite differences
(tramp/tests/test_beliefs.py, tramp/checks/check_gradients.py:79-90):
    r = dA/db,  v = d^2A/db^2,  tau = -2 dA/da.
Here jax.grad gives the *exact* derivatives, which is a strictly stronger
test than the reference's numerical differences.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tramp_tpu import beliefs


POINTS = [(1.0, 0.5), (2.0, -1.3), (0.7, 2.1), (5.0, 0.0), (0.05, 0.3)]


def check_grads(A, r, v, tau, a, b, rtol=1e-9):
    dA_db = jax.grad(A, argnums=1)(a, b)
    np.testing.assert_allclose(r(a, b), dA_db, rtol=rtol, err_msg="r != dA/db")
    d2A_db2 = jax.grad(lambda a, b: jax.grad(A, argnums=1)(a, b), argnums=1)(a, b)
    np.testing.assert_allclose(v(a, b), d2A_db2, rtol=rtol, atol=1e-12,
                               err_msg="v != d2A/db2")
    dA_da = jax.grad(A, argnums=0)(a, b)
    np.testing.assert_allclose(tau(a, b), -2 * dA_da, rtol=rtol, atol=1e-12,
                               err_msg="tau != -2 dA/da")


@pytest.mark.parametrize("a,b", POINTS)
def test_normal(a, b):
    m = beliefs.normal
    check_grads(m.A, m.r, m.v, m.tau, a, b)


@pytest.mark.parametrize("a,b", POINTS)
def test_sparse(a, b):
    m = beliefs.sparse
    eta = 0.37
    check_grads(
        lambda a, b: m.A(a, b, eta), lambda a, b: m.r(a, b, eta),
        lambda a, b: m.v(a, b, eta), lambda a, b: m.tau(a, b, eta), a, b)


@pytest.mark.parametrize("a,b", POINTS)
def test_binary(a, b):
    m = beliefs.binary
    # A depends only on b; tau = 1 = -2 d/da (A - a/2) convention: binary A
    # has no a-dependence in the reference; check r and v only.
    dA_db = jax.grad(m.A)(b)
    np.testing.assert_allclose(m.r(b), dA_db, rtol=1e-9)
    d2A = jax.grad(lambda b: jax.grad(m.A)(b))(b)
    np.testing.assert_allclose(m.v(b), d2A, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("a,b", POINTS + [(1.0, -8.0), (0.3, 12.0)])
def test_positive(a, b):
    m = beliefs.positive
    check_grads(m.A, m.r, m.v, m.tau, a, b, rtol=1e-6)


@pytest.mark.parametrize("a,b", POINTS)
@pytest.mark.parametrize("bounds", [(-1.0, 1.0), (0.5, 3.0), (-np.inf, 0.0)])
def test_truncated(a, b, bounds):
    m = beliefs.truncated
    xmin, xmax = bounds
    check_grads(
        lambda a, b: m.A(a, b, xmin, xmax), lambda a, b: m.r(a, b, xmin, xmax),
        lambda a, b: m.v(a, b, xmin, xmax),
        lambda a, b: m.tau(a, b, xmin, xmax), a, b, rtol=1e-6)


@pytest.mark.parametrize("b", [-0.5, -2.0, -7.3])
def test_exponential(b):
    m = beliefs.exponential
    dA_db = jax.grad(m.A)(b)
    np.testing.assert_allclose(m.r(b), dA_db, rtol=1e-9)
    d2A = jax.grad(lambda b: jax.grad(m.A)(b))(b)
    np.testing.assert_allclose(m.v(b), d2A, rtol=1e-9)


@pytest.mark.parametrize("a,b", POINTS)
def test_mixture(a, b):
    m = beliefs.mixture
    eta = jnp.asarray([0.2, -0.4, 1.1])
    aK = jnp.asarray([a, 2 * a, 0.5 * a])
    bK = jnp.asarray([b, b - 1.0, b + 0.5])

    # scalar A over a perturbation direction of b (all components share db)
    def A_of_db(db):
        return m.A(aK, bK + db, eta)

    dA = jax.grad(A_of_db)(0.0)
    np.testing.assert_allclose(m.r(aK, bK, eta), dA, rtol=1e-9)
    d2A = jax.grad(lambda db: jax.grad(A_of_db)(db))(0.0)
    np.testing.assert_allclose(m.v(aK, bK, eta), d2A, rtol=1e-9)


def test_sparse_vs_reference_values():
    "Spot parity against the reference formulas computed with numpy/scipy."
    from scipy.special import expit
    a, b, eta = 1.7, -0.9, 0.23
    An = 0.5 * (b**2 / a + np.log(2 * np.pi / a))
    want_A = np.logaddexp(eta, An)
    want_p = expit(An - eta)
    np.testing.assert_allclose(beliefs.sparse.A(a, b, eta), want_A, rtol=1e-12)
    np.testing.assert_allclose(beliefs.sparse.p(a, b, eta), want_p, rtol=1e-12)
