"""Channels. Registry mirrors reference tramp/channels/__init__.py:36-70."""
from .base_channel import Channel, SIFactor, SOFactor, MatrixFactorization
from .gaussian_channel import GaussianChannel
from .linear_channel import LinearChannel
from .analytical_linear_channel import (
    AnalyticalLinearChannel, MarchenkoPasturChannel)
from .shape_channels import (
    BiasChannel, SumChannel, DuplicateChannel, ConcatChannel, ReshapeChannel)
from .piecewise_linear_channel import (
    PiecewiseLinearChannel, SgnChannel, AbsChannel, AsymmetricAbsChannel,
    ReluChannel, LeakyReluChannel, HardTanhChannel, HardSigmoidChannel,
    SymmetricDoorChannel,
)

CHANNEL_CLASSES = {
    "gaussian": GaussianChannel,
    "linear": LinearChannel,
    "marchenko": MarchenkoPasturChannel,
    "analytical": AnalyticalLinearChannel,
    "bias": BiasChannel,
    "sum": SumChannel,
    "duplicate": DuplicateChannel,
    "concat": ConcatChannel,
    "reshape": ReshapeChannel,
    "sgn": SgnChannel,
    "abs": AbsChannel,
    "a-abs": AsymmetricAbsChannel,
    "relu": ReluChannel,
    "l-relu": LeakyReluChannel,
    "h-tanh": HardTanhChannel,
    "h-sigm": HardSigmoidChannel,
    "door": SymmetricDoorChannel,
}


def get_channel(channel_type, **kwargs):
    return CHANNEL_CLASSES[channel_type](**kwargs)


__all__ = [
    "Channel", "SIFactor", "SOFactor", "MatrixFactorization",
    "GaussianChannel", "LinearChannel", "AnalyticalLinearChannel",
    "MarchenkoPasturChannel", "BiasChannel", "SumChannel",
    "DuplicateChannel", "ConcatChannel", "ReshapeChannel",
    "PiecewiseLinearChannel", "SgnChannel", "AbsChannel",
    "AsymmetricAbsChannel", "ReluChannel", "LeakyReluChannel",
    "HardTanhChannel", "HardSigmoidChannel", "SymmetricDoorChannel",
    "CHANNEL_CLASSES", "get_channel",
]
