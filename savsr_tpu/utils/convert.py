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


def invert_state_dict(params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """JAX param dict -> torch-layout state dict (exact inverse of
    ``convert_state_dict``, incl. the int64 restore of BN
    ``num_batches_tracked`` — so imports can be round-trip verified and
    trained JAX checkpoints can be exported back to the reference tooling)."""
    out: Dict[str, np.ndarray] = {}
    for key, v in params.items():
        v = np.asarray(v)
        if key.endswith("weight_compress") or key.endswith("weight_expand"):
            out[key] = v[..., None, None]  # [n,o,i] -> [n,o,i,1,1]
        elif v.ndim == 5:
            out[key] = v.transpose(0, 4, 3, 1, 2)  # [K,k,k,I,O] -> [K,O,I,k,k]
        elif v.ndim == 4:
            out[key] = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif v.ndim == 2:
            out[key] = v.transpose(1, 0)
        else:
            out[key] = v
        if key.endswith("num_batches_tracked"):
            out[key] = out[key].astype(np.int64)
    return out


def to_device_params(np_params: Dict[str, np.ndarray], dtype=None):
    import jax.numpy as jnp

    out = {}
    for k, v in np_params.items():
        arr = jnp.asarray(v)
        if dtype is not None and arr.dtype in (jnp.float32, jnp.float64):
            arr = arr.astype(dtype)
        out[k] = arr
    return out


def verify_against_arch(converted: Dict[str, np.ndarray],
                        network_g: Dict | None = None) -> list[str]:
    """Exact key/shape accounting of a converted param dict against a fresh
    arch init (default: the flagship SAVSR of the released checkpoint,
    reference README.md:130). Returns a list of problems (empty = clean)."""
    from ..archs import build_network

    net_opt = dict(network_g or {
        "type": "SAVSR", "num_in_ch": 3, "num_feat": 64, "num_frame": 7,
        "slid_win": 3, "fusion_win": 5, "interval": 0, "w1_num_block": 4,
        "w2_num_block": 2, "n_resgroups": 4, "n_resblocks": 8,
    })
    import jax

    model = build_network(net_opt)
    expect = model.init(jax.random.PRNGKey(0))
    problems = []
    for k in sorted(set(expect) - set(converted)):
        problems.append(f"missing from checkpoint: {k} {tuple(expect[k].shape)}")
    for k in sorted(set(converted) - set(expect)):
        problems.append(f"unexpected in checkpoint: {k} {tuple(np.shape(converted[k]))}")
    for k in sorted(set(expect) & set(converted)):
        es, cs = tuple(expect[k].shape), tuple(np.shape(converted[k]))
        if es != cs:
            problems.append(f"shape mismatch {k}: arch {es} vs checkpoint {cs}")
    return problems


def main(argv=None) -> int:
    """CLI: ``python -m savsr_tpu.utils.convert <src.pth|src.npz> <dst.npz>``

    Converts a reference torch checkpoint (e.g. the released
    ``savsr_best.pth``) to this framework's ``.npz`` param format, verifies
    the full key/shape accounting against the flagship arch, and round-trip
    checks the layout transposes (convert -> invert == source)."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("src", help=".pth or .npz torch-layout checkpoint")
    p.add_argument("dst", help="output .npz path")
    p.add_argument("--param-key", default="params",
                   help=".pth dict key to import (params | params_ema)")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the arch key/shape accounting")
    args = p.parse_args(argv)

    if args.src.endswith(".npz"):
        raw = dict(np.load(args.src))
        raw = {k.replace("module.", ""): v for k, v in raw.items()}
    else:
        import torch

        ckpt = torch.load(args.src, map_location="cpu", weights_only=True)
        if args.param_key in ckpt:
            ckpt = ckpt[args.param_key]
        elif "params" in ckpt:
            ckpt = ckpt["params"]
        raw = {k.replace("module.", ""): v.numpy() for k, v in ckpt.items()}

    converted = convert_state_dict(raw)

    # round-trip the layout transposes against the source
    back = invert_state_dict(converted)
    for k, v in raw.items():
        assert np.array_equal(back[k], np.asarray(v)), f"round-trip mismatch: {k}"

    if not args.no_verify:
        problems = verify_against_arch(converted)
        if problems:
            for line in problems:
                print(f"  {line}")
            print(f"FAILED: {len(problems)} accounting problems "
                  f"({len(converted)} checkpoint keys)")
            return 1

    np.savez(args.dst, **converted)
    n_par = sum(int(np.prod(v.shape)) for v in converted.values())
    print(f"OK: {len(converted)} tensors, {n_par / 1e6:.2f}M params, "
          f"round-trip exact -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
