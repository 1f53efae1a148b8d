"""Config system, registry, file-client, and converter unit tests."""

import numpy as np
import pytest

from savsr_tpu.utils.options import apply_force_yml, dict2str, yaml_load
from savsr_tpu.utils.registry import Registry


def test_yaml_tuple_literal():
    opt = yaml_load("scale: !!python/tuple [3.05, 2.5]\nname: x\n")
    assert opt["scale"] == (3.05, 2.5)
    assert isinstance(opt["scale"], tuple)


def test_force_yml_overrides():
    opt = {"train": {"ema_decay": 0.99, "optim_g": {"lr": 1e-4}}, "name": "a"}
    apply_force_yml(opt, ["train:ema_decay=0.999", "train:optim_g:lr=!!float 2e-4"])
    assert opt["train"]["ema_decay"] == 0.999
    assert opt["train"]["optim_g"]["lr"] == 2e-4
    apply_force_yml(opt, ["name=none"])
    assert opt["name"] is None
    with pytest.raises(KeyError):
        apply_force_yml(opt, ["train:new_key=1"])


def test_parse_options_full(tmp_path, monkeypatch):
    from savsr_tpu.utils.options import parse_options

    yml = """
name: myexp
model_type: SRModel
num_gpu: 1
manual_seed: 3
datasets:
  train:
    name: d
    type: T
    dataroot_gt: ~/data/gt
  val_x4:
    name: v
    type: T
scale: !!python/tuple [2, 2]
path:
  pretrain_network_g: ~
"""
    cfg = tmp_path / "c.yml"
    cfg.write_text(yml)
    opt, args = parse_options(
        str(tmp_path), is_train=True, args_list=["-opt", str(cfg), "--debug"]
    )
    assert opt["name"].startswith("debug_")
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["val_x4"]["phase"] == "val"
    assert opt["datasets"]["train"]["scale"] == (2, 2)
    assert "~" not in opt["datasets"]["train"]["dataroot_gt"]
    assert opt["path"]["models"].endswith("models")
    assert opt["is_train"] and not opt["dist"]

    opt2, _ = parse_options(
        str(tmp_path), is_train=False, args_list=["-opt", str(cfg)]
    )
    assert opt2["path"]["results_root"].endswith("myexp")


def test_registry_suffix_and_errors():
    reg = Registry("toy")

    @reg.register()
    class Thing:
        pass

    @reg.register(suffix="savsr_tpu")
    class Widget:
        pass

    assert reg.get("Thing") is Thing
    assert reg.get("Widget") is Widget  # via suffix fallback
    with pytest.raises(KeyError):
        reg.get("Missing")
    with pytest.raises(KeyError):
        reg.register(Thing)  # duplicate


def test_memory_file_client():
    from savsr_tpu.utils.file_client import FileClient

    fc = FileClient("memory", store={"a/b": b"xyz"})
    assert fc.get("a/b") == b"xyz"


def test_convert_roundtrip_layouts():
    from savsr_tpu.utils.convert import convert_state_dict

    sd = {
        "conv.weight": np.zeros((8, 4, 3, 3)),       # OIHW
        "conv.bias": np.zeros((8,)),
        "lin.weight": np.zeros((16, 4)),              # [out, in]
        "bank.weight": np.zeros((5, 8, 4, 3, 3)),     # [K,O,I,k,k]
        "up.weight_compress": np.zeros((4, 8, 64, 1, 1)),
        "bn.num_batches_tracked": np.zeros((), np.int64),
    }
    out = convert_state_dict(sd)
    assert out["conv.weight"].shape == (3, 3, 4, 8)
    assert out["lin.weight"].shape == (4, 16)
    assert out["bank.weight"].shape == (5, 3, 3, 4, 8)
    assert out["up.weight_compress"].shape == (4, 8, 64)
    assert out["bn.num_batches_tracked"].dtype == np.int32


def test_dict2str():
    s = dict2str({"a": 1, "b": {"c": 2}})
    assert "a: 1" in s and "c: 2" in s


def test_rgb2ycbcr_jnp_full_matrix_matches_host():
    """Device colorspace transform, full-YCbCr path (VERDICT r2 #9) vs the
    host reference implementation."""
    import numpy as np

    from savsr_tpu.utils.color_util import rgb2ycbcr, rgb2ycbcr_jnp

    rng = np.random.default_rng(0)
    img = rng.random((5, 6, 3)).astype(np.float32)
    host = rgb2ycbcr(img, y_only=False)  # float in, float [0,1]-scaled out
    dev = np.asarray(rgb2ycbcr_jnp(img, y_only=False))
    assert dev.shape == (5, 6, 3)
    assert np.abs(dev - host).max() < 1e-5
    y_dev = np.asarray(rgb2ycbcr_jnp(img, y_only=True))
    assert np.abs(y_dev - host[..., 0]).max() < 1e-5


def test_memcached_backend_registered_and_gated():
    """The memcached backend exists (reference file_client.py:147) and
    raises the reference's ImportError without the client lib."""
    import pytest

    from savsr_tpu.utils.file_client import FileClient

    assert "memcached" in FileClient._backends
    with pytest.raises(ImportError, match="memcached"):
        FileClient("memcached", server_list_cfg="/na", client_cfg="/na")
