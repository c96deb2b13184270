"""Parity vs the actual reference for structured (FFT/spectral) channels,
MAP priors, shape channels, and an end-to-end sparse-gradient model.
Skipped when the reference checkout is unavailable."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_oracle import reference_available, load_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

RNG = np.random.RandomState(7)


def _assert_posteriors(mine, ref, az, bz, ax, bx, name, rtol=1e-8):
    r_m, v_m = mine.compute_backward_posterior(
        az, jnp.asarray(bz), ax, jnp.asarray(bx))
    r_r, v_r = ref.compute_backward_posterior(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(r_m), np.asarray(r_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} bwd r")
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} bwd v")
    r_m, v_m = mine.compute_forward_posterior(
        az, jnp.asarray(bz), ax, jnp.asarray(bx))
    r_r, v_r = ref.compute_forward_posterior(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(r_m), np.asarray(r_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} fwd r")
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} fwd v")


def test_gradient_channel_parity():
    load_reference()
    from tramp.channels import GradientChannel as Ref
    from tramp_tpu.channels import GradientChannel
    N = 16
    mine, ref = GradientChannel(shape=(N,)), Ref(shape=(N,))
    az, ax = 1.3, 0.7
    bz = RNG.randn(N)
    bx = RNG.randn(1, N)
    _assert_posteriors(mine, ref, az, bz, ax, bx, "gradient")


def test_blur1d_channel_parity():
    load_reference()
    from tramp.channels import Blur1DChannel as Ref
    from tramp_tpu.channels import Blur1DChannel
    N = 24
    mine, ref = (Blur1DChannel(sigma=2.0, N=N), Ref(sigma=2.0, N=N))
    az, ax = 0.9, 1.4
    bz, bx = RNG.randn(N), RNG.randn(N)
    _assert_posteriors(mine, ref, az, bz, ax, bx, "blur1d")


def _assert_messages(mine, ref, az, bz, ax, bx, name, rtol=1e-8):
    "DFT/Rotation/Bias define closed-form messages, not posteriors (both sides)."
    a_m, b_m = mine.compute_backward_message(az, jnp.asarray(bz), ax,
                                             jnp.asarray(bx))
    a_r, b_r = ref.compute_backward_message(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), rtol=rtol,
                               err_msg=f"{name} bwd a")
    np.testing.assert_allclose(np.asarray(b_m), np.asarray(b_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} bwd b")
    a_m, b_m = mine.compute_forward_message(az, jnp.asarray(bz), ax,
                                            jnp.asarray(bx))
    a_r, b_r = ref.compute_forward_message(az, bz, ax, bx)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), rtol=rtol,
                               err_msg=f"{name} fwd a")
    np.testing.assert_allclose(np.asarray(b_m), np.asarray(b_r), rtol=rtol,
                               atol=1e-10, err_msg=f"{name} fwd b")


def test_dft_channel_parity():
    load_reference()
    from tramp.channels import DFTChannel as Ref
    from tramp_tpu.channels import DFTChannel
    N = 16
    mine, ref = DFTChannel(real=True), Ref(real=True)
    az, ax = 1.1, 0.5
    bz = RNG.randn(N)
    bx = RNG.randn(2, N)  # complex packed as (2, N)
    _assert_messages(mine, ref, az, bz, ax, bx, "dft")


def test_rotation_channel_parity():
    load_reference()
    from tramp.channels import RotationChannel as Ref
    from tramp_tpu.channels import RotationChannel
    from scipy.stats import ortho_group
    N = 12
    R = ortho_group.rvs(N, random_state=3)
    mine, ref = RotationChannel(jnp.asarray(R)), Ref(R)
    az, ax = 1.7, 0.8
    bz, bx = RNG.randn(N), RNG.randn(N)
    _assert_messages(mine, ref, az, bz, ax, bx, "rotation")


def test_bias_sum_duplicate_parity():
    load_reference()
    from tramp.channels import (
        BiasChannel as RefBias, SumChannel as RefSum,
        DuplicateChannel as RefDup)
    from tramp_tpu.channels import BiasChannel, SumChannel, DuplicateChannel
    n = 10
    b = RNG.randn(n)
    az, ax = 1.2, 0.9
    bz, bx = RNG.randn(n), RNG.randn(n)
    _assert_messages(BiasChannel(jnp.asarray(b)), RefBias(b),
                     az, bz, ax, bx, "bias")

    # SumChannel: 2 inputs, backward messages to each input
    mine, ref = SumChannel(n_prev=2), RefSum(n_prev=2)
    azs, bzs = [1.1, 0.7], [RNG.randn(n), RNG.randn(n)]
    a_m, b_m = mine.compute_backward_message(
        azs, [jnp.asarray(x) for x in bzs], ax, jnp.asarray(bx))
    a_r, b_r = ref.compute_backward_message(azs, bzs, ax, bx)
    for k in range(2):
        np.testing.assert_allclose(np.asarray(a_m[k]), a_r[k], rtol=1e-8,
                                   err_msg=f"sum bwd a[{k}]")
        np.testing.assert_allclose(np.asarray(b_m[k]), b_r[k], rtol=1e-8,
                                   err_msg=f"sum bwd b[{k}]")

    # DuplicateChannel: 2 outputs, backward message to the input
    mine, ref = DuplicateChannel(n_next=2), RefDup(n_next=2)
    axs, bxs = [0.8, 1.3], [RNG.randn(n), RNG.randn(n)]
    a_m, b_m = mine.compute_backward_message(
        az, jnp.asarray(bz), axs, [jnp.asarray(x) for x in bxs])
    a_r, b_r = ref.compute_backward_message(az, bz, axs, bxs)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), rtol=1e-8,
                               err_msg="dup bwd a")
    np.testing.assert_allclose(np.asarray(b_m), np.asarray(b_r), rtol=1e-8,
                               err_msg="dup bwd b")


def test_map_l21_prior_parity():
    load_reference()
    from tramp.priors import MAP_L21NormPrior as Ref
    from tramp_tpu.priors import MAP_L21NormPrior
    shape = (2, 12)
    mine = MAP_L21NormPrior(size=shape, gamma=1.4)
    ref = Ref(size=shape, gamma=1.4)
    ax = 2.0
    bx = RNG.randn(*shape)
    r_m, v_m = mine.compute_forward_posterior(ax, jnp.asarray(bx))
    r_r, v_r = ref.compute_forward_posterior(ax, bx)
    np.testing.assert_allclose(np.asarray(r_m), r_r, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_r), rtol=1e-8)


def test_gaussian_mixture_se_parity():
    load_reference()
    import tramp.priors as rp
    import tramp_tpu.priors as mp
    mine = mp.GaussianMixturePrior(size=8, probs=[0.3, 0.7],
                                   means=[-1.0, 1.0], vars=[0.5, 1.5])
    ref = rp.GaussianMixturePrior(size=8, probs=[0.3, 0.7],
                                  means=[-1, 1], vars=[0.5, 1.5])
    for ax in (0.5, 2.0):
        np.testing.assert_allclose(
            float(mine.compute_forward_error(ax)),
            float(ref.compute_forward_error(ax)), rtol=1e-6,
            err_msg=f"gmm fwd error ax={ax}")


def test_sparse_gradient_model_parity():
    "End-to-end sparse-gradient regression vs reference, identical (A, y)."
    load_reference()
    import tramp.models.total_variation_model as rtv
    from tramp.algos import ExpectationPropagation as RefEP
    from tramp_tpu.models import sparse_gradient_regression
    from tramp_tpu.algos import ExpectationPropagation

    rng = np.random.RandomState(2)
    N, M = 32, 24
    x0 = np.zeros(N)
    x0[: N // 2] = 1.0
    A = rng.randn(M, N) / np.sqrt(N)
    noise_var = 1e-3
    y = A @ x0 + np.sqrt(noise_var) * rng.randn(M)

    ref_model = rtv.sparse_gradient_regression(
        A, y, x_shape=(N,), grad_rho=0.1, noise_var=noise_var, prior_var=1.0)
    my_model = sparse_gradient_regression(
        jnp.asarray(A), jnp.asarray(y), x_shape=(N,), grad_rho=0.1,
        noise_var=noise_var, prior_var=1.0)

    n_iter = 60
    ref_ep = RefEP(ref_model)
    ref_ep.iterate(max_iter=n_iter, damping=0.1, callback=lambda *a: False)
    my_ep = ExpectationPropagation(my_model)
    my_ep.iterate(max_iter=n_iter, damping=0.1, tol=0.0)

    ref_d = ref_ep.get_variable_data("x")
    my_d = my_ep.get_variable_data("x")
    np.testing.assert_allclose(np.asarray(my_d["r"]), ref_d["r"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(my_d["v"]), np.asarray(ref_d["v"]),
                               rtol=1e-4, atol=1e-6)


def test_tv_denoiser_model_parity():
    """End-to-end TV denoiser (SIMO x -> Gaussian likelihood + gradient
    branch with MAP-L21 leaf prior), ConstantInit(a=1, b=1), damping 0 —
    the reference's raccoon-denoise TV topology
    (plot_raccoon_denoise.py:135-150)."""
    load_reference()
    from tramp.variables import (
        SIMOVariable as RSIMO, MILeafVariable as RMIL, SILeafVariable as RO)
    from tramp.priors import (
        GaussianPrior as RGP, MAP_L21NormPrior as RL21)
    from tramp.channels import (
        GradientChannel as RGrad, GaussianChannel as RGC)
    from tramp.algos import (
        ExpectationPropagation as RefEP, ConstantInit as RefCI)
    from tramp_tpu.variables import (
        SIMOVariable, MILeafVariable, SILeafVariable as O)
    from tramp_tpu.priors import GaussianPrior, MAP_L21NormPrior
    from tramp_tpu.channels import GradientChannel, GaussianChannel
    from tramp_tpu.algos import ExpectationPropagation, ConstantInit

    H = W = 8
    noise_var = 0.1
    rng = np.random.RandomState(3)
    x0 = rng.randn(H, W)
    y = x0 + np.sqrt(noise_var) * rng.randn(H, W)

    ref_model = (
        RGP(size=(H, W)) @ RSIMO(id="x", n_next=2) @ (
            RGC(var=noise_var) @ RO("y") + (
                RGrad(shape=(H, W)) + RL21(size=(2, H, W), gamma=1)
            ) @ RMIL(id="x'", n_prev=2)
        )
    ).to_model().to_observed({"y": y})
    ref = RefEP(ref_model)
    ref.iterate(max_iter=20, damping=0, initializer=RefCI(a=1, b=1))

    my_model = (
        GaussianPrior(size=(H, W)) @ SIMOVariable(id="x", n_next=2) @ (
            GaussianChannel(var=noise_var) @ O("y") + (
                GradientChannel(shape=(H, W)) +
                MAP_L21NormPrior(size=(2, H, W), gamma=1, axis=0)
            ) @ MILeafVariable(id="x'", n_prev=2)
        )
    ).to_model().to_observed({"y": jnp.asarray(y)})
    mine = ExpectationPropagation(my_model)
    mine.iterate(max_iter=20, damping=0.0, initializer=ConstantInit(a=1, b=1))

    for vid in ["x", "x'"]:
        r_ref = np.asarray(ref.get_variable_data(vid)["r"])
        r_my = np.asarray(mine.get_variable_data(vid)["r"])
        np.testing.assert_allclose(r_my, r_ref, rtol=1e-8, atol=1e-10,
                                   err_msg=f"TV denoiser r[{vid}]")
