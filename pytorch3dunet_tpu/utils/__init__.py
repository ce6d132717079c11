from pytorch3dunet_tpu.utils.misc import (
    RunningAverage,
    convert_to_numpy,
    get_class,
    get_logger,
    get_number_of_learnable_parameters,
    number_of_features_per_level,
)
from pytorch3dunet_tpu.utils.tb import TensorboardFormatter

__all__ = [
    "RunningAverage",
    "TensorboardFormatter",
    "convert_to_numpy",
    "get_class",
    "get_logger",
    "get_number_of_learnable_parameters",
    "number_of_features_per_level",
]
