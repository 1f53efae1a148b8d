from .color_util import bgr2ycbcr, rgb2ycbcr, rgb2ycbcr_jnp, ycbcr2bgr, ycbcr2rgb
from .dist_util import get_dist_info, init_dist, is_master, master_only
from .file_client import FileClient
from .img_util import (
    array2img,
    crop_border,
    imfrombytes,
    imread,
    imwrite,
    img2array,
)
from .logger import AvgTimer, MessageLogger, get_env_info, get_root_logger, init_tb_logger, init_wandb_logger
from .misc import (
    check_resume,
    get_time_str,
    make_exp_dirs,
    mkdir_and_rename,
    scandir,
    set_random_seed,
    sizeof_fmt,
)
from .options import apply_force_yml, dict2str, parse_options, yaml_load
from .registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
    Registry,
)

__all__ = [
    # color
    "bgr2ycbcr", "rgb2ycbcr", "rgb2ycbcr_jnp", "ycbcr2bgr", "ycbcr2rgb",
    # dist
    "get_dist_info", "init_dist", "is_master", "master_only",
    # io
    "FileClient", "imfrombytes", "imread", "imwrite",
    "img2array", "array2img", "crop_border",
    # logging
    "AvgTimer", "MessageLogger", "get_env_info", "get_root_logger", "init_tb_logger",
    "init_wandb_logger",
    # misc
    "check_resume", "get_time_str", "make_exp_dirs", "mkdir_and_rename",
    "scandir", "set_random_seed", "sizeof_fmt",
    # options
    "apply_force_yml", "dict2str", "parse_options", "yaml_load",
    # registry
    "Registry", "DATASET_REGISTRY", "ARCH_REGISTRY", "MODEL_REGISTRY",
    "LOSS_REGISTRY", "METRIC_REGISTRY",
]
