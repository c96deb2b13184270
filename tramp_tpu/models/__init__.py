from .graph import DiGraph
from .dag_algebra import (
    DAG, FactorDAG, ModelDAG, PlaceHolder, RootPlaceHolder, LeafPlaceHolder,
)
from .base_model import Model
from .generalized_linear_model import glm_generative, glm_state_evolution
from .multi_layer_model import MultiLayerModel
from .factor_model import FactorModel
from .committee_model import committee, sgn_committee, soft_committee
from .total_variation_model import (
    sparse_gradient_block, tv_block, regression_block, classification_block,
    sparse_gradient_regression, sparse_gradient_classification,
    tv_regression, tv_classification,
)

__all__ = [
    "DiGraph", "DAG", "FactorDAG", "ModelDAG", "Model",
    "glm_generative", "glm_state_evolution", "MultiLayerModel",
    "FactorModel", "committee", "sgn_committee", "soft_committee",
    "sparse_gradient_block", "tv_block", "regression_block",
    "classification_block", "sparse_gradient_regression",
    "sparse_gradient_classification", "tv_regression", "tv_classification",
]
