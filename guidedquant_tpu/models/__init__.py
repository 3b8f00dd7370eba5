from .config import ModelConfig, RopeScaling, get_config, CONFIGS  # noqa: F401
from . import llama  # noqa: F401
