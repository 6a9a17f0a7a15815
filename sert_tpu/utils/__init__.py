"""L1 utilities: structured logging, typed configs, pytree helpers."""

from sert_tpu.utils.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    RecipeConfig,
    ScoreConfig,
    TrainConfig,
    config_from_dict,
    config_to_dict,
)
from sert_tpu.utils.logging import JsonlLogger, get_logger  # noqa: F401
