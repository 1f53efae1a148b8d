from copy import deepcopy

from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import (
    calculate_psnr,
    calculate_psnr_jnp,
    calculate_ssim,
    calculate_ssim_jnp,
)

__all__ = [
    "calculate_psnr",
    "calculate_ssim",
    "calculate_psnr_jnp",
    "calculate_ssim_jnp",
    "calculate_metric",
]

# optional metrics register themselves on import
from . import niqe as _niqe  # noqa: F401,E402


def calculate_metric(data: dict, opt: dict):
    """Instantiate and run a metric from an options dict (key ``type``)."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
