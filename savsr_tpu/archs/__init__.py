from copy import deepcopy

from ..utils.registry import ARCH_REGISTRY
from . import savsr_arch  # noqa: F401  (registers SAVSR)

__all__ = ["build_network"]


def build_network(opt):
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    return ARCH_REGISTRY.get(network_type)(**opt)
