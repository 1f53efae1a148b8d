"""PyTorch checkpoint -> JAX parameter-dict conversion.

Our parameter keys mirror the reference state_dict names 1:1; conversion is
a pure layout transpose per tensor class:

  conv weight   [O, I, kh, kw]      -> HWIO [kh, kw, I, O]
  linear weight [out, in]           -> [in, out]
  OSConv bank   [K, O, I, k, k]     -> [K, k, k, I, O]
  STAU experts  [n, o, i, 1, 1]     -> [n, o, i]
  1-D / scalars                     -> copied

Inputs: a ``.npz`` of numpy arrays (state_dict exported with numpy) or a
torch ``.pth`` file (loaded via torch if importable — torch is never needed
at inference/training time, only for one-off import of reference weights).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Torch-layout state dict (numpy values) -> JAX param dict."""
    out: Dict[str, np.ndarray] = {}
    for key, v in sd.items():
        v = np.asarray(v)
        if key.endswith("weight_compress") or key.endswith("weight_expand"):
            out[key] = v[..., 0, 0]  # [n, o, i, 1, 1] -> [n, o, i]
        elif v.ndim == 5:
            out[key] = v.transpose(0, 3, 4, 2, 1)  # [K,O,I,k,k] -> [K,k,k,I,O]
        elif v.ndim == 4:
            out[key] = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif v.ndim == 2:
            out[key] = v.transpose(1, 0)  # [out,in] -> [in,out]
        else:
            out[key] = v
        if out[key].dtype == np.int64:
            out[key] = out[key].astype(np.int32)
    return out


def load_torch_checkpoint(path: str, param_key: str | None = "params") -> Dict[str, np.ndarray]:
    """Load a reference ``.pth``/``.npz`` checkpoint into a JAX param dict.

    ``.pth`` files store {'params': ..., 'params_ema': ...}
    (reference base_model.py:231-239); pass param_key to select.
    """
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch  # local import: only needed for one-off weight import

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        if param_key is not None and param_key in ckpt:
            ckpt = ckpt[param_key]
        elif "params" in ckpt:
            ckpt = ckpt["params"]
        sd = {k.replace("module.", ""): v.numpy() for k, v in ckpt.items()}
    return convert_state_dict(sd)


def to_device_params(np_params: Dict[str, np.ndarray], dtype=None):
    import jax.numpy as jnp

    out = {}
    for k, v in np_params.items():
        arr = jnp.asarray(v)
        if dtype is not None and arr.dtype in (jnp.float32, jnp.float64):
            arr = arr.astype(dtype)
        out[k] = arr
    return out
