from .graph import DiGraph
from .dag_algebra import (
    DAG, FactorDAG, ModelDAG, PlaceHolder, RootPlaceHolder, LeafPlaceHolder,
)
from .base_model import Model
from .generalized_linear_model import glm_generative, glm_state_evolution
from .multi_layer_model import MultiLayerModel
from .factor_model import FactorModel

__all__ = [
    "DiGraph", "DAG", "FactorDAG", "ModelDAG", "Model",
    "glm_generative", "glm_state_evolution", "MultiLayerModel",
    "FactorModel",
]
