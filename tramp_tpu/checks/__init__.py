from .check_gradients import (
    numerical_1st_derivative, numerical_2nd_derivative,
    check_belief_grad_b, plot_belief_grad_b,
    check_prior_grad_EP, check_prior_grad_BO, check_prior_grad_RS,
    check_likelihood_grad_EP,
)
from .check_limits import check_prior_BO_limit, check_likelihood_BO_limit
from .check_high_dim import check_prior_concentration

__all__ = [
    "numerical_1st_derivative", "numerical_2nd_derivative",
    "check_belief_grad_b", "plot_belief_grad_b", "check_prior_grad_EP",
    "check_prior_grad_BO", "check_prior_grad_RS",
    "check_likelihood_grad_EP", "check_prior_BO_limit",
    "check_likelihood_BO_limit", "check_prior_concentration",
]
