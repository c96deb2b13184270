"""Sparse-gradient / TV model builders.
Reference tramp/models/total_variation_model.py."""
import numpy as np

from ..variables import SISOVariable as V, SIMOVariable, MILeafVariable
from ..channels import (
    LinearChannel, GaussianChannel, GradientChannel, ReshapeChannel)
from ..priors import GaussianPrior, GaussBernoulliPrior, MAP_L21NormPrior
from ..likelihoods import GaussianLikelihood, SgnLikelihood


def sparse_gradient_block(x_shape, prior_var, grad_rho):
    "x with Gaussian prior whose gradient is GaussBernoulli. Ref l:10-24."
    d = len(x_shape)
    grad_shape = (d,) + x_shape
    N = int(np.prod(x_shape))
    block = (
        GaussianPrior(size=x_shape, var=prior_var) @
        SIMOVariable(id="x", n_next=2) @ ((
            GradientChannel(shape=x_shape) +
            GaussBernoulliPrior(size=grad_shape, rho=grad_rho)
        ) @ MILeafVariable(id="x'", n_prev=2))
    ) @ ReshapeChannel(prev_shape=x_shape, next_shape=N)
    return block


def tv_block(x_shape, prior_var, grad_scale):
    "x with Gaussian prior whose gradient is MAP L21. Reference l:27-37."
    d = len(x_shape)
    grad_shape = (d,) + x_shape
    N = int(np.prod(x_shape))
    block = (
        GaussianPrior(size=x_shape, var=prior_var) @
        SIMOVariable(id="x", n_next=2) @ ((
            GradientChannel(shape=x_shape) +
            MAP_L21NormPrior(size=grad_shape, gamma=grad_scale, axis=0)
        ) @ MILeafVariable(id="x'", n_prev=2))
    ) @ ReshapeChannel(prev_shape=x_shape, next_shape=N)
    return block


def regression_block(A, y, noise_var):
    return (LinearChannel(A, name="A") @ V(id="z") @
            GaussianLikelihood(y, var=noise_var))


def classification_block(A, y, noise_var):
    return (LinearChannel(A, name="A") @ V(id="z") @
            GaussianChannel(var=noise_var) @ V(id="a") @ SgnLikelihood(y))


def sparse_gradient_regression(A, y, x_shape, grad_rho, noise_var, prior_var):
    block = sparse_gradient_block(x_shape, prior_var, grad_rho)
    return (block @ V(id="r") @ regression_block(A, y, noise_var)).to_model()


def sparse_gradient_classification(A, y, x_shape, grad_rho, noise_var,
                                   prior_var):
    block = sparse_gradient_block(x_shape, prior_var, grad_rho)
    return (block @ V(id="r") @
            classification_block(A, y, noise_var)).to_model()


def tv_regression(A, y, x_shape, grad_scale, noise_var, prior_var):
    block = tv_block(x_shape, prior_var, grad_scale)
    return (block @ V(id="r") @ regression_block(A, y, noise_var)).to_model()


def tv_classification(A, y, x_shape, grad_scale, noise_var, prior_var):
    block = tv_block(x_shape, prior_var, grad_scale)
    return (block @ V(id="r") @
            classification_block(A, y, noise_var)).to_model()
