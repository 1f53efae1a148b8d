"""VGG feature extractor for perceptual losses (reference: vgg_arch.py).

Weights are an external asset (torchvision's pretrained VGG19 is not
bundled and this environment has no egress); convert once with
``savsr_tpu.utils.convert.convert_state_dict`` on a torchvision state_dict
and pass the resulting .npz via ``vgg_weights_path``. Without weights the
extractor still runs (random init) for shape/smoke purposes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.registry import ARCH_REGISTRY

VGG19_LAYERS = [
    "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
    "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
    "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
    "conv3_4", "relu3_4", "pool3",
    "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
    "conv4_4", "relu4_4", "pool4",
    "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
    "conv5_4", "relu5_4", "pool5",
]

_VGG19_CHANNELS = {
    "1": (64, 64), "2": (128, 128), "3": (256, 256, 256, 256),
    "4": (512, 512, 512, 512), "5": (512, 512, 512, 512),
}

# ImageNet normalization (reference vgg_arch.py registers these buffers)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


@ARCH_REGISTRY.register()
class VGGFeatureExtractor:
    """Run VGG19 up to the requested layers and return their activations.

    Params: flat dict {'conv1_1.weight': HWIO, 'conv1_1.bias': [C], ...}.
    Input: NHWC RGB in [0, 1].
    """

    def __init__(
        self,
        layer_name_list: Sequence[str],
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        vgg_weights_path: str | None = None,
    ):
        assert vgg_type == "vgg19", "only vgg19 is implemented"
        self.layer_name_list = list(layer_name_list)
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        max_idx = max(VGG19_LAYERS.index(v) for v in self.layer_name_list)
        self.layers = VGG19_LAYERS[: max_idx + 1]
        self.vgg_weights_path = vgg_weights_path

    def conv_shapes(self) -> Dict[str, tuple]:
        shapes = {}
        cin = 3
        for name in self.layers:
            if name.startswith("conv"):
                block, idx = name[4], int(name[6])
                cout = _VGG19_CHANNELS[block][idx - 1]
                shapes[name] = (3, 3, cin, cout)
                cin = cout
            elif name.startswith("pool"):
                pass
        return shapes

    def init(self, key) -> Dict[str, jnp.ndarray]:
        if self.vgg_weights_path:
            data = np.load(self.vgg_weights_path)
            return {k: jnp.asarray(v) for k, v in data.items()}
        params = {}
        for name, shape in self.conv_shapes().items():
            key, k1, k2 = jax.random.split(key, 3)
            fan_in = shape[0] * shape[1] * shape[2]
            bound = 1.0 / np.sqrt(fan_in)
            params[f"{name}.weight"] = jax.random.uniform(k1, shape, jnp.float32, -bound, bound)
            params[f"{name}.bias"] = jax.random.uniform(k2, (shape[3],), jnp.float32, -bound, bound)
        return params

    def apply(self, params: Dict, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            x = (x - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(_STD, x.dtype)
        out = {}
        for name in self.layers:
            if name.startswith("conv"):
                x = lax.conv_general_dilated(
                    x, params[f"{name}.weight"].astype(x.dtype), (1, 1),
                    ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + params[f"{name}.bias"].astype(x.dtype)
            elif name.startswith("relu"):
                x = jax.nn.relu(x)
            elif name.startswith("pool"):
                x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            if name in self.layer_name_list:
                out[name] = x
        return out
