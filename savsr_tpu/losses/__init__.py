from copy import deepcopy

from ..utils.logger import get_root_logger
from ..utils.registry import LOSS_REGISTRY
from .basic_loss import CharbonnierLoss, L1Loss, MSELoss, PerceptualLoss, WeightedTVLoss
from .gan_loss import GANLoss, MultiScaleGANLoss

__all__ = [
    "PerceptualLoss",
    "L1Loss",
    "MSELoss",
    "CharbonnierLoss",
    "WeightedTVLoss",
    "GANLoss",
    "MultiScaleGANLoss",
    "build_loss",
]


def build_loss(opt):
    """Instantiate a loss from an options dict (key ``type``)."""
    opt = deepcopy(opt)
    loss_type = opt.pop("type")
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    get_root_logger().info(f"Loss [{loss.__class__.__name__}] is created.")
    return loss
