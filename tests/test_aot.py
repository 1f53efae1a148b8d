"""Executable-level AOT persistence (utils/aot.py): round-trip, key
invalidation, failure fallback, and eval-path (val: aot_cache) parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.utils.aot import compile_cached


def test_roundtrip_and_key_stability(tmp_path):
    d = str(tmp_path)
    f = lambda x: (x * 3 + 1).sum()  # noqa: E731
    x = jnp.ones((32, 32))
    c1, i1 = compile_cached(f, (x,), tag="t", aot_dir=d)
    assert i1["source"] == "compiled" and os.path.isfile(i1["path"])
    assert float(c1(x)) == float((x * 3 + 1).sum())
    c2, i2 = compile_cached(f, (x,), tag="t", aot_dir=d)
    assert i2["source"] == "aot-cache" and i2["key"] == i1["key"]
    assert float(c2(x)) == float(c1(x))


def test_key_changes_with_code_and_shape(tmp_path):
    d = str(tmp_path)
    x = jnp.ones((16, 16))
    _, i1 = compile_cached(lambda x: (x * 3).sum(), (x,), tag="t", aot_dir=d)
    _, i2 = compile_cached(lambda x: (x * 4).sum(), (x,), tag="t", aot_dir=d)
    _, i3 = compile_cached(lambda x: (x * 3).sum(), (jnp.ones((8, 8)),),
                           tag="t", aot_dir=d)
    assert len({i1["key"], i2["key"], i3["key"]}) == 3


def test_corrupt_entry_recompiles(tmp_path):
    d = str(tmp_path)
    f = lambda x: (x + 2).sum()  # noqa: E731
    x = jnp.ones((8, 8))
    _, i1 = compile_cached(f, (x,), tag="t", aot_dir=d)
    with open(i1["path"], "wb") as fh:
        fh.write(b"garbage")
    c2, i2 = compile_cached(f, (x,), tag="t", aot_dir=d)
    assert i2["source"] == "compiled"  # fell back and overwrote
    assert float(c2(x)) == float((x + 2).sum())
    c3, i3 = compile_cached(f, (x,), tag="t", aot_dir=d)
    assert i3["source"] == "aot-cache"


def test_sidecar_list_and_prune(tmp_path):
    """Cache-management surface: every save writes a metadata sidecar,
    list_entries orders by recency, prune_cache deletes LRU past the cap,
    and the writer auto-prunes via SAVSR_AOT_MAX_GB."""
    import time

    from savsr_tpu.utils.aot import list_entries, prune_cache

    d = str(tmp_path)
    x = jnp.ones((16, 16))
    _, i1 = compile_cached(lambda x: (x * 2).sum(), (x,), tag="a", aot_dir=d)
    time.sleep(0.05)
    _, i2 = compile_cached(lambda x: (x * 5).sum(), (x,), tag="b", aot_dir=d)

    # sidecars exist and carry the expected metadata
    import json

    with open(i1["path"] + ".json") as f:
        meta = json.load(f)
    assert meta["tag"] == "a" and meta["key"] == i1["key"]
    assert meta["jax_version"] == jax.__version__
    assert meta["args"] == ["float32[16, 16]"]

    entries = list_entries(d)
    assert [e["meta"]["tag"] for e in entries] == ["b", "a"]  # newest first

    # using entry "a" again refreshes its recency (LRU touch on hit)
    time.sleep(0.05)
    _, i1b = compile_cached(lambda x: (x * 2).sum(), (x,), tag="a", aot_dir=d)
    assert i1b["source"] == "aot-cache"
    entries = list_entries(d)
    assert entries[0]["meta"]["tag"] == "a"

    # prune to a cap that fits only the most recent entry -> "b" deleted
    one = entries[0]["bytes"]
    deleted = prune_cache(d, max_gb=one * 1.5 / 1e9)
    assert deleted == [i2["path"]]
    assert not os.path.exists(i2["path"]) and not os.path.exists(i2["path"] + ".json")
    assert os.path.exists(i1["path"])

    # the writer enforces the env cap: with a tiny cap, older entries go
    os.environ["SAVSR_AOT_MAX_GB"] = str(one * 1.5 / 1e9)
    try:
        _, i3 = compile_cached(lambda x: (x * 7).sum(), (x,), tag="c", aot_dir=d)
        assert os.path.exists(i3["path"])  # just-written entry always kept
        assert not os.path.exists(i1["path"])  # LRU evicted
    finally:
        del os.environ["SAVSR_AOT_MAX_GB"]


def test_aot_cli(tmp_path, capsys):
    """python -m savsr_tpu.aot list|prune."""
    from savsr_tpu.aot import main

    d = str(tmp_path)
    x = jnp.ones((8, 8))
    compile_cached(lambda x: (x + 1).sum(), (x,), tag="cli", aot_dir=d)
    assert main(["list", "--dir", d]) == 0
    out = capsys.readouterr().out
    assert "1 entries" in out and "tag=cli" in out
    assert main(["prune", "--max-gb", "0", "--dir", d]) == 0
    out = capsys.readouterr().out
    assert "pruned 1 entries" in out
    assert main(["list", "--dir", d]) == 0
    assert "0 entries" in capsys.readouterr().out


def test_eval_aot_cache_matches_jit(tmp_path, monkeypatch):
    """SRModel eval with val: aot_cache: true must produce the same output
    as the plain jit path (same program, persisted executable)."""
    monkeypatch.setenv("SAVSR_AOT_DIR", str(tmp_path / "aot"))
    from savsr_tpu.models import build_model

    def model_for(aot):
        opt = {
            "name": f"aot{aot}", "model_type": "ASVSRModel", "num_gpu": 1,
            "is_train": False, "dist": False, "rank": 0, "world_size": 1,
            "manual_seed": 0, "scale": (2.0, 2.0),
            "network_g": dict(
                type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7,
                slid_win=3, fusion_win=5, interval=0, w1_num_block=2,
                w2_num_block=1, n_resgroups=1, n_resblocks=2,
                center_frame_idx=None,
            ),
            "path": {"pretrain_network_g": None, "strict_load_g": True},
            "val": {"save_img": False, "aot_cache": aot,
                    "metrics": {"psnr": {"type": "calculate_psnr",
                                          "crop_border": 0}}},
            "datasets": {},
        }
        return build_model(opt)

    rng = np.random.default_rng(0)
    lq = rng.random((1, 7, 12, 14, 3), dtype=np.float32)

    m_jit = model_for(False)
    m_jit.feed_data({"lq": lq, "scale": (2.0, 2.0)})
    m_jit.test()
    out_jit = np.asarray(m_jit.output)

    m_aot = model_for(True)
    m_aot.params = m_jit.params  # same weights
    m_aot.feed_data({"lq": lq, "scale": (2.0, 2.0)})
    m_aot.test()
    out_aot = np.asarray(m_aot.output)
    np.testing.assert_allclose(out_aot, out_jit, rtol=0, atol=0)

    # a second fresh model instance loads the persisted executable
    m_aot2 = model_for(True)
    m_aot2.params = m_jit.params
    m_aot2.feed_data({"lq": lq, "scale": (2.0, 2.0)})
    m_aot2.test()
    np.testing.assert_allclose(np.asarray(m_aot2.output), out_jit, rtol=0, atol=0)
    entries = list((tmp_path / "aot").glob("eval_fwd_*.jaxexe"))
    assert len(entries) == 1, entries
