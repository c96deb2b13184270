from .check_gradients import (
    numerical_1st_derivative, numerical_2nd_derivative,
    check_belief_grad_b, plot_belief_grad_b,
    check_prior_grad_EP, check_prior_grad_BO, check_prior_grad_BO_BN,
    check_prior_grad_FG, check_prior_grad_RS,
    check_likelihood_grad_EP, check_likelihood_grad_BO,
    check_likelihood_grad_BO_BN, check_likelihood_grad_RS,
    plot_prior_grad_EP, plot_prior_grad_BO, plot_prior_grad_BO_BN,
    plot_prior_grad_FG, plot_likelihood_grad_EP, plot_likelihood_grad_BO,
    plot_likelihood_grad_BO_BN,
)
from .check_limits import check_prior_BO_limit, check_likelihood_BO_limit
from .check_high_dim import check_prior_concentration

__all__ = [
    "numerical_1st_derivative", "numerical_2nd_derivative",
    "check_belief_grad_b", "plot_belief_grad_b",
    "check_prior_grad_EP", "check_prior_grad_BO", "check_prior_grad_BO_BN",
    "check_prior_grad_FG", "check_prior_grad_RS",
    "check_likelihood_grad_EP", "check_likelihood_grad_BO",
    "check_likelihood_grad_BO_BN", "check_likelihood_grad_RS",
    "plot_prior_grad_EP", "plot_prior_grad_BO", "plot_prior_grad_BO_BN",
    "plot_prior_grad_FG", "plot_likelihood_grad_EP",
    "plot_likelihood_grad_BO", "plot_likelihood_grad_BO_BN",
    "check_prior_BO_limit", "check_likelihood_BO_limit",
    "check_prior_concentration",
]
