from copy import deepcopy

from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY

# import model modules so their @register decorators run
from . import asvsr_model  # noqa: F401
from . import sr_model  # noqa: F401
from . import video_base_model  # noqa: F401
from . import video_recurrent_model  # noqa: F401

__all__ = ["build_model"]


def build_model(opt):
    """Instantiate a model wrapper by its YAML ``model_type``."""
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    get_root_logger().info(f"Model [{model.__class__.__name__}] is created.")
    return model
