"""SRModel: generic single-output super-resolution trainer/evaluator.

Counterpart of lbasicsr/models/sr_model.py. The train step is one jitted
pure function (forward -> pixel loss -> grads -> optax update -> EMA),
compiled per (input shape, scale); data parallelism comes from batch
shardings over the model's mesh, with XLA inserting the gradient
all-reduce.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from os import path as osp
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..archs import build_network
from ..data.resize import resize_np
from ..losses import build_loss
from ..metrics import calculate_metric
from ..parallel.mesh import replicate, shard_or_replicate_batch
from ..utils.img_util import array2img, imwrite
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel, split_params


@MODEL_REGISTRY.register()
class SRModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_g = build_network(opt["network_g"])

        seed = opt.get("manual_seed") or 0
        self.params = self.net_g.init(jax.random.PRNGKey(seed))

        load_path = self.opt["path"].get("pretrain_network_g")
        if load_path is not None:
            param_key = self.opt["path"].get("param_key_g", "params")
            loaded = self.load_network(
                load_path, param_key, self.opt["path"].get("strict_load_g", True)
            )
            self.check_loaded_keys(self.params, loaded,
                                   self.opt["path"].get("strict_load_g", True))
            self.params = {k: jnp.asarray(v) for k, v in loaded.items()}

        self.params = replicate(self.params, self.mesh)
        self.params_ema = None
        self.scale = self.opt.get("scale", (4, 4))
        self._fwd_cache = {}

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------------ #
    # training setup
    # ------------------------------------------------------------------ #

    def init_training_settings(self) -> None:
        train_opt = self.opt["train"]
        self.ema_decay = train_opt.get("ema_decay", 0)
        logger = get_root_logger()
        if self.ema_decay > 0:
            logger.info(f"Use Exponential Moving Average with decay: {self.ema_decay}")
            load_path = self.opt["path"].get("pretrain_network_g")
            if load_path is not None:
                try:
                    ema = self.load_network(load_path, "params_ema", strict=True)
                    self.params_ema = replicate(
                        {k: jnp.asarray(v) for k, v in ema.items()}, self.mesh
                    )
                except Exception:
                    self.params_ema = jax.tree_util.tree_map(jnp.copy, dict(self.params))  # copy: donation must not alias params
            else:
                self.params_ema = jax.tree_util.tree_map(jnp.copy, dict(self.params))  # copy: donation must not alias params

        self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
        self.cri_perceptual = (
            build_loss(train_opt["perceptual_opt"]) if train_opt.get("perceptual_opt") else None
        )
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError("Both pixel and perceptual losses are None.")

        self.setup_optimizers()
        self.setup_schedulers()

    def setup_optimizers(self) -> None:
        train_opt = self.opt["train"]
        optim_opt = dict(train_opt["optim_g"])
        optim_type = optim_opt.pop("type")
        self.base_lr = optim_opt.get("lr", 1e-4)
        self.optimizer_g = self.get_optimizer(optim_type, **optim_opt)
        trainable, _ = split_params(self.params)
        self.opt_state = replicate(self.optimizer_g.init(trainable), self.mesh)
        self.optimizers = [self.optimizer_g]

    # ------------------------------------------------------------------ #
    # data / step
    # ------------------------------------------------------------------ #

    def prepare_batch(self, data: Dict) -> Dict:
        """Host->device upload + sharding, separated from feed_data so a
        DevicePrefetcher can run it one batch ahead (the TPU analogue of the
        reference CUDAPrefetcher, prefetch_dataloader.py:84-125)."""
        out = dict(data)
        batch = {"lq": np.asarray(data["lq"], dtype=np.float32)}
        if "gt" in data:
            batch["gt"] = np.asarray(data["gt"], dtype=np.float32)
        out.update(shard_or_replicate_batch(batch, self.mesh))
        return out

    def feed_data(self, data: Dict) -> None:
        if isinstance(data.get("lq"), jax.Array):
            # already uploaded by prepare_batch (device prefetch path)
            batch = data
        else:
            batch = self.prepare_batch(data)
        self.lq = batch["lq"]
        self.gt = batch.get("gt")
        if "scale" in data and data["scale"] is not None:
            s = data["scale"]
            self.scale = (float(s[0]), float(s[1])) if isinstance(s, (tuple, list)) else (float(s), float(s))

    @staticmethod
    def _cast_like(updates: Dict, ref: Dict) -> Dict:
        return {
            k: v.astype(ref[k].dtype) if k in ref else v
            for k, v in updates.items()
        }

    def _loss_fn(self, trainable, stats, lq, gt, scale, bucket_ops=None):
        params = {**trainable, **stats}
        # bf16 compute with f32 master params: the AMP analogue of the
        # reference's autocast+GradScaler (asvsr_model.py:79,93,118-120) —
        # no loss scaling needed, bf16 shares f32's exponent range
        if self.opt.get("train", {}).get("bf16", False):
            params = {
                k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                for k, v in params.items()
            }
            lq = lq.astype(jnp.bfloat16)
        if self.opt.get("train", {}).get("degrade_on_device", False):
            # on-the-fly asBI degradation inside the jitted step: the host
            # only crops GT; the bicubic-matmul downsample runs on the MXU
            from ..data.resize import resize_jax

            gt_seq = lq  # feed_data passed the GT sequence in the lq slot
            h, w = gt_seq.shape[-3], gt_seq.shape[-2]
            size = (round(h / scale[0]), round(w / scale[1]))
            lq = resize_jax(gt_seq, size, mode=self.opt["train"].get("downsample_mode", "torch"))
        if bucket_ops is not None:
            # bucketed multi-scale training (train: bucket_train: true):
            # output/gt live on an HR bucket canvas; the pixel loss is
            # masked to the true region and renormalized to the reference's
            # mean-over-true-pixels (archs/bucketed.py)
            output, stats_updates = self.net_g.apply(
                params, lq, scale, train=True, bucket=bucket_ops
            )
        else:
            output, stats_updates = self.net_g.apply(params, lq, scale, train=True)
        output = output.astype(jnp.float32)
        losses = {}
        total = 0.0
        if self.cri_pix is not None:
            if bucket_ops is not None:
                l_pix = self.cri_pix(
                    output, gt, weight=bucket_ops["mask_hr"]
                ) * bucket_ops["loss_scale"]
            else:
                l_pix = self.cri_pix(output, gt)
            losses["l_pix"] = l_pix
            total = total + l_pix
        if self.cri_perceptual is not None:
            # VGG features are defined on 4-D NHWC images; fold any leading
            # temporal axis into the batch (reference sr_model.py applies the
            # percep/style terms to the full output, sr_model.py:108-118)
            out4 = output.reshape((-1,) + output.shape[-3:])
            gt4 = gt.reshape((-1,) + gt.shape[-3:])
            l_percep, l_style = self.cri_perceptual(out4, gt4)
            if l_percep is not None:
                losses["l_percep"] = l_percep
                total = total + l_percep
            if l_style is not None:
                losses["l_style"] = l_style
                total = total + l_style
        losses["l_total"] = total
        return total, (losses, stats_updates, output)

    def _train_step_impl(self, trainable, stats, ema, opt_state, lq, gt, lr,
                         scale, grad_factors=None, bucket_ops=None):
        accum = int(self.opt.get("train", {}).get("accum_steps", 1))
        if accum > 1:
            if lq.shape[0] % accum != 0:
                raise ValueError(
                    f"train: accum_steps={accum} requires the batch dimension "
                    f"({lq.shape[0]}) to be divisible by it — adjust "
                    f"batch_size_per_gpu or accum_steps."
                )
            # gradient micro-batching: with remat off, a half-batch
            # forward+backward fits on-chip and two serialized micro-steps
            # beat one full-batch step that must recompute the forward
            # (remat). Gradient = mean over micro-batch gradients (equal to
            # the full-batch gradient up to BatchNorm batch-stat granularity:
            # BN layers normalize per micro-batch, standard grad-accum
            # semantics); BN running stats chain sequentially like
            # consecutive forwards.
            lq_m = lq.reshape((accum, lq.shape[0] // accum) + lq.shape[1:])
            gt_m = gt.reshape((accum, gt.shape[0] // accum) + gt.shape[1:])

            if self.opt.get("train", {}).get("accum_impl", "scan") == "scan":
                def micro(carry, xs):
                    stats_c, gsum = carry
                    mlq, mgt = xs
                    (_, (losses, su, _)), g = jax.value_and_grad(
                        self._loss_fn, has_aux=True
                    )(trainable, stats_c, mlq, mgt, scale,
                      bucket_ops=bucket_ops)
                    stats_c = {**stats_c, **self._cast_like(su, stats_c)}
                    gsum = jax.tree_util.tree_map(lambda a, b: a + b, gsum, g)
                    return (stats_c, gsum), losses

                gzero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
                (stats_n, gsum), losses_seq = jax.lax.scan(
                    micro, (stats, gzero), (lq_m, gt_m)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                losses = jax.tree_util.tree_map(lambda x: x.mean(), losses_seq)
            else:
                # unrolled micro-steps (train: accum_impl: unroll —
                # measured NO faster than the scan: 44.9 vs 46.2 samples/s
                # at the shipped recipe; the scan's per-iteration weight
                # copy-starts profiled at ~31 ms/step are overlapped DMAs,
                # not critical path. Kept as a knob for larger accum. The
                # optimization_barrier ties each micro-step's INPUTS to the
                # previous step's grads: without it XLA interleaves the two
                # fwd+bwd passes and doubles activation liveness (measured
                # 17.55G > 15.75G HBM OOM at the shipped B=16 recipe with
                # the einsum engine's patch tensors; 'unroll_nobarrier'
                # re-allows the interleave for engines with small saved
                # activations, e.g. taps).
                barrier = (
                    self.opt["train"].get("accum_impl") != "unroll_nobarrier"
                )
                stats_n = stats
                gsum = None
                losses_list = []
                for m in range(accum):
                    mlq, mgt = lq_m[m], gt_m[m]
                    if m > 0 and barrier:
                        mlq, mgt, gsum, stats_n = jax.lax.optimization_barrier(
                            (mlq, mgt, gsum, stats_n)
                        )
                    (_, (losses_m, su, _)), g = jax.value_and_grad(
                        self._loss_fn, has_aux=True
                    )(trainable, stats_n, mlq, mgt, scale,
                      bucket_ops=bucket_ops)
                    stats_n = {**stats_n, **self._cast_like(su, stats_n)}
                    gsum = g if gsum is None else jax.tree_util.tree_map(
                        lambda a, b: a + b, gsum, g
                    )
                    losses_list.append(losses_m)
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                losses = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs).mean(), *losses_list
                )
            stats_updates = {k: stats_n[k] for k in stats_n}
        else:
            (_, (losses, stats_updates, _)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(trainable, stats, lq, gt, scale, bucket_ops=bucket_ops)
        if grad_factors is not None:
            # per-parameter gradient scaling (flow freeze / flow_lr_mul,
            # reference video_recurrent_model.py:23-65)
            grads = {k: g * grad_factors.get(k, 1.0) for k, g in grads.items()}
        updates, opt_state = self.optimizer_g.update(grads, opt_state, trainable)
        if not getattr(self, "_opt_self_scaled", False):
            # ASGD/Rprop return final updates (lr lives inside the
            # transform); everything else is scaled by the scheduled lr here
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        trainable = jax.tree_util.tree_map(lambda p, u: p + u, trainable, updates)
        # cast BN running-stat updates back to the master dtype (under
        # train.bf16 the forward computes them in bf16; the stored stats
        # must stay f32 masters)
        stats = {**stats, **self._cast_like(stats_updates, stats)}
        if ema is not None:
            decay = self.ema_decay
            ema = {
                k: (ema[k] * decay + trainable[k] * (1 - decay)) if k in trainable else stats[k]
                for k in ema
            }
        return trainable, stats, ema, opt_state, losses

    # the jitted step (self/scale static, state buffers donated); the impl
    # stays addressable for the AOT-persistence path below
    _train_step = functools.partial(
        jax.jit, static_argnames=("self", "scale"),
        donate_argnames=("trainable", "stats", "ema", "opt_state"),
    )(_train_step_impl)

    def _train_bucket_ops(self, scale):
        """Cached HR-bucket operands + canvas dims for bucketed multi-scale
        training (train: bucket_train: true). One compiled training program
        serves every drawn scale whose rounded HR canvas matches — the
        shipped 60-entry scale pool collapses from 60 programs to the few
        distinct (Hb, Wb) canvases (archs/bucketed.py train_bucket_dims)."""
        from ..archs.bucketed import make_train_bucket_operands, train_bucket_dims

        h0, w0 = int(self.lq.shape[-3]), int(self.lq.shape[-2])
        mult = int(self.opt["train"].get("bucket_mult", 64))
        key = (h0, w0, scale, mult)
        cache = getattr(self, "_bucket_train_cache", None)
        if cache is None:
            cache = self._bucket_train_cache = {}
        if key not in cache:
            dims = train_bucket_dims(h0, w0, scale, mult)
            cache[key] = (make_train_bucket_operands(h0, w0, scale, dims), dims)
        return cache[key]

    def optimize_parameters(self, current_iter: int) -> None:
        lr = getattr(self, "_current_lrs", [self.base_lr])[0]
        trainable, stats = split_params(self.params)
        ema = self.params_ema if self.ema_decay > 0 else None
        scale = tuple(self.scale) if isinstance(self.scale, (tuple, list)) else (self.scale, self.scale)
        grad_factors = getattr(self, "_flow_factors", None)
        if grad_factors is not None:
            grad_factors = {k: jnp.float32(v) for k, v in grad_factors.items()}
        bucket_ops, gt = None, self.gt
        if self.opt.get("train", {}).get("bucket_train", False):
            from ..archs.bucketed import pad_gt_to_bucket

            if self.cri_perceptual is not None:
                raise NotImplementedError(
                    "train: bucket_train does not compose with perceptual "
                    "losses (VGG features are undefined on a masked canvas)"
                )
            if self.opt["train"].get("degrade_on_device", False):
                raise NotImplementedError(
                    "train: bucket_train requires host-side degradation "
                    "(degrade_on_device resizes by the static scale)"
                )
            if self.gt.ndim == 5:
                # recurrent GT [B,T,H,W,C]: raise here, BEFORE pad_gt_to_bucket
                # fails with an opaque rank-mismatch, so users get the intended
                # message (the recurrent arch upsamples per frame)
                raise NotImplementedError(
                    "train: bucket_train is only supported by the windowed "
                    "ASVSRModel (the recurrent arch upsamples per frame)"
                )
            bucket_ops, dims = self._train_bucket_ops(scale)
            gt = pad_gt_to_bucket(self.gt, dims)
            # the program is keyed by the CANVAS, not the scale
            scale = (1.0, 1.0)
        if self.opt.get("train", {}).get("aot_cache", False):
            # executable-level disk persistence for the training step
            # (train: aot_cache: true): the pure-XLA step participates in
            # JAX's persistent compile cache, but through the TPU relay even
            # a cache HIT costs minutes for the big training program — the
            # pickled PJRT executable loads in seconds. Donation survives
            # serialization (input-output aliasing is part of the HLO).
            def step_fn(trainable, stats, ema, opt_state, lq, gt, lr,
                        grad_factors, bucket_ops):
                return self._train_step_impl(
                    trainable, stats, ema, opt_state, lq, gt, lr, scale,
                    grad_factors, bucket_ops)

            trainable, stats, ema, self.opt_state, losses = self._aot_call(
                ("train_aot", scale, ema is None, grad_factors is None,
                 bucket_ops is None),
                step_fn,
                (trainable, stats, ema, self.opt_state, self.lq, gt,
                 jnp.float32(lr), grad_factors, bucket_ops),
                tag="train_step",
                donate_argnames=("trainable", "stats", "ema", "opt_state"),
            )
        else:
            trainable, stats, ema, self.opt_state, losses = self._train_step(
                trainable, stats, ema, self.opt_state, self.lq, gt,
                jnp.float32(lr), scale, grad_factors, bucket_ops,
            )
        self.params = {**trainable, **stats}
        if ema is not None:
            self.params_ema = ema
        self.defer_loss_fetch(losses)

    # ------------------------------------------------------------------ #
    # inference / eval
    # ------------------------------------------------------------------ #

    def _stau_statics_cached(self, params, hw, scale, dtype, bucket=None,
                             bucket_key=None):
        """One-entry host cache of the frame-invariant STAU coordinate-head
        outputs (SAVSR.stau_statics): the head costs ~10 ms/frame at 720p
        recomputed inline, but depends only on (params, shape, scale) —
        eval iterates a clip's frames with both fixed, so each shape/scale
        computes it once. Invalidated on params identity change (new
        checkpoint / EMA swap)."""
        if not hasattr(self.net_g, "stau_statics"):
            return None
        key = (hw, scale, jnp.dtype(dtype).name, bucket_key)
        cached = getattr(self, "_stau_statics", None)
        # identity (not id()) comparison on params: a new checkpoint / EMA
        # swap / train step produces a new dict object -> recompute
        if cached is None or cached[0] != key or cached[1] is not params:
            if not hasattr(self, "_stau_statics_jit"):
                self._stau_statics_jit = jax.jit(
                    self.net_g.stau_statics,
                    static_argnames=("lq_hw", "scale", "dtype"),
                )
            self._stau_statics = (key, params, self._stau_statics_jit(
                params, lq_hw=hw, scale=scale, dtype=dtype, bucket=bucket
            ))
        return self._stau_statics[2]

    def _aot_call(self, cache_key, fn, args, tag, donate_argnames=()):
        """Executable-level disk persistence for an eval forward
        (``val: aot_cache: true``; utils/aot.py): Mosaic custom-call
        programs (the chw serving engine) skip JAX's persistent compile
        cache, so a fresh eval process would otherwise pay the remote
        serving compile per program. Entries are keyed by the lowered HLO
        digest — any code/shape/flag change re-keys them. In-memory cache
        is keyed by the concrete arg shapes (a Compiled is shape-special-
        ized, unlike jit)."""
        from ..utils.aot import compile_cached

        shapes = tuple(
            (tuple(a.shape), str(a.dtype))
            for a in jax.tree_util.tree_leaves(args)
            if hasattr(a, "shape")
        )
        key = (cache_key, shapes)
        if key not in self._fwd_cache:
            compiled, info = compile_cached(
                fn, args, tag=tag, donate_argnames=donate_argnames)
            get_root_logger().info(f"eval AOT executable: {info}")
            self._fwd_cache[key] = compiled
        return self._fwd_cache[key](*args)

    def _forward_eval(self, params, lq, scale):
        val_opt = self.opt.get("val") or {}
        if val_opt.get("bucket_eval") and hasattr(self.net_g, "cfg"):
            return self._forward_eval_bucketed(params, lq, scale, val_opt)
        statics = self._stau_statics_cached(
            params, (int(lq.shape[2]), int(lq.shape[3])), scale, lq.dtype
        )
        use_statics = statics is not None
        if val_opt.get("aot_cache"):
            def fwd_c(params, lq, statics):
                kw = {"stau_statics": statics} if use_statics else {}
                out, _ = self.net_g.apply(params, lq, scale, train=False, **kw)
                return out

            return self._aot_call(("fwd_aot", scale, use_statics), fwd_c,
                                  (params, lq, statics), tag="eval_fwd")
        key = ("fwd", use_statics)
        if key not in self._fwd_cache:

            @functools.partial(jax.jit, static_argnames=("scale",))
            def fwd(params, lq, scale, statics):
                kw = {"stau_statics": statics} if use_statics else {}
                out, _ = self.net_g.apply(params, lq, scale, train=False, **kw)
                return out
            self._fwd_cache[key] = fwd
        return self._fwd_cache[key](params, lq, scale, statics)

    def _forward_eval_bucketed(self, params, lq, scale, val_opt):
        """Any-scale bucketed eval (archs/bucketed.py): every (clip shape,
        scale) whose bucket matches shares ONE compiled program — the
        multi-scale sweep compiles a handful of programs instead of one per
        (shape, scale). Enable with ``val: bucket_eval: true``; bucket
        granularity via ``val: bucket_mult: [16, 64]`` (LR, HR)."""
        from ..archs.bucketed import (
            make_bucket_operands,
            pad_clip_to_bucket,
            savsr_apply_bucketed,
        )
        from ..archs.savsr_arch import get_hw, normalize_scale

        scale = normalize_scale(scale)
        m_lr, m_hr = val_opt.get("bucket_mult", (16, 64))
        h0, w0 = int(lq.shape[2]), int(lq.shape[3])
        H, W = get_hw(h0, w0, scale)
        rnd = lambda v, m: -(-v // m) * m
        plan = getattr(self, "bucket_plan", None)
        if plan and (h0, w0, scale) in plan:
            # auto-grouped sweep plan (test.py::_plan_sweep_buckets)
            lrb, hrb = plan[(h0, w0, scale)]
        elif val_opt.get("bucket_lr"):
            # fixed buckets: the whole multi-scale sweep shares ONE program
            lrb = tuple(val_opt["bucket_lr"])
            hrb = tuple(val_opt["bucket_hr"])
        else:
            lrb = (rnd(h0 + 2, m_lr), rnd(w0 + 2, m_lr))
            hrb = (rnd(H, m_hr), rnd(W, m_hr))

        ops_key = (h0, w0, scale, lrb, hrb)
        cached = getattr(self, "_bucket_ops", None)
        if cached is None or cached[0] != ops_key:
            # 1-entry cache: eval iterates a clip's frames consecutively,
            # and the operand set (coordinate grids etc.) is several MB
            self._bucket_ops = (ops_key, make_bucket_operands(h0, w0, scale, lrb, hrb))
        ops = self._bucket_ops[1]

        statics = self._stau_statics_cached(
            params, (h0, w0), scale, lq.dtype, bucket=ops, bucket_key=ops_key
        )
        jit_key = ("bucket", lrb, hrb, lq.shape[0], lq.shape[1])
        canvas = jnp.asarray(pad_clip_to_bucket(np.asarray(lq), lrb))
        bucket_fwd = lambda p, x, ops, st: savsr_apply_bucketed(  # noqa: E731
            p, x, ops, self.net_g.cfg, stau_statics=st
        )
        if val_opt.get("aot_cache"):
            out = self._aot_call(jit_key, bucket_fwd,
                                 (params, canvas, ops, statics),
                                 tag="eval_bucket")
            return out[:, :H, :W]
        if jit_key not in self._fwd_cache:
            self._fwd_cache[jit_key] = jax.jit(bucket_fwd)
        out = self._fwd_cache[jit_key](params, canvas, ops, statics)
        return out[:, :H, :W]

    def test(self) -> None:
        params = self.params_ema if self.params_ema is not None else self.params
        scale = tuple(self.scale) if isinstance(self.scale, (tuple, list)) else (self.scale, self.scale)
        self.output = self._forward_eval(params, self.lq, scale)

    def test_selfensemble(self) -> None:
        """x8 geometric self-ensemble (reference sr_model.py:141-187): run
        the forward on all flip/transpose variants, invert the transforms on
        the outputs, average. Transposition swaps the scale axes."""
        params = self.params_ema if self.params_ema is not None else self.params
        scale = tuple(self.scale) if isinstance(self.scale, (tuple, list)) else (self.scale, self.scale)
        lq = np.asarray(self.lq)
        h_ax, w_ax = lq.ndim - 3, lq.ndim - 2

        variants = []
        for tf in ("identity", "h", "v", "hv"):
            a = lq
            if "h" in tf:
                a = np.flip(a, axis=w_ax)
            if "v" in tf:
                a = np.flip(a, axis=h_ax)
            variants.append((tf, False, np.ascontiguousarray(a)))
        for tf, _, a in list(variants):
            variants.append((tf, True, np.ascontiguousarray(np.swapaxes(a, h_ax, w_ax))))

        outputs = []
        for tf, transposed, a in variants:
            s = (scale[1], scale[0]) if transposed else scale
            out = np.asarray(self._forward_eval(params, jnp.asarray(a), s))
            oh, ow = out.ndim - 3, out.ndim - 2
            if transposed:
                out = np.swapaxes(out, oh, ow)
            if "v" in tf:
                out = np.flip(out, axis=oh)
            if "h" in tf:
                out = np.flip(out, axis=ow)
            outputs.append(out)
        self.output = jnp.asarray(np.mean(np.stack(outputs, 0), axis=0))

    def get_current_visuals(self) -> "OrderedDict":
        """lq / result / gt as host numpy; arbitrary-scale BI post-process:
        if output and gt shapes differ, bicubic-resize (antialiased) the
        output to the gt size (reference sr_model.py:291-304)."""
        out = np.asarray(self.output)
        gt = np.asarray(self.gt) if self.gt is not None else None
        if gt is not None and out.shape != gt.shape:
            out = resize_np(out, (gt.shape[-3], gt.shape[-2]), mode="torch", antialias=True)
        d = OrderedDict()
        d["lq"] = np.asarray(self.lq)
        d["result"] = out
        if gt is not None:
            d["gt"] = gt
        return d

    # ------------------------------------------------------------------ #
    # validation
    # ------------------------------------------------------------------ #

    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img=False):
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset_name = dataloader.dataset.opt["name"]
        with_metrics = self.opt["val"].get("metrics") is not None
        use_pbar = self.opt["val"].get("pbar", False)
        if with_metrics:
            self.metric_results = {m: 0 for m in self.opt["val"]["metrics"].keys()}
            self._initialize_best_metric_results(dataset_name)

        cnt = 0
        for val_data in dataloader:
            img_name = osp.splitext(osp.basename(val_data["lq_path"][0]))[0]
            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()
            sr_img = array2img(visuals["result"][0])
            metric_data = {"img": sr_img}
            if "gt" in visuals:
                metric_data["img2"] = array2img(visuals["gt"][0])

            if save_img:
                if self.opt["is_train"]:
                    save_path = osp.join(
                        self.opt["path"]["visualization"], img_name,
                        f"{img_name}_{current_iter}.png",
                    )
                else:
                    suffix = self.opt["val"].get("suffix") or self.opt["name"]
                    save_path = osp.join(
                        self.opt["path"]["visualization"], dataset_name,
                        f"{img_name}_{suffix}.png",
                    )
                imwrite(sr_img, save_path)

            if with_metrics:
                for name, opt_ in self.opt["val"]["metrics"].items():
                    self.metric_results[name] += calculate_metric(metric_data, opt_)
            cnt += 1

        if with_metrics:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= cnt
                self._update_best_metric_result(
                    dataset_name, metric, self.metric_results[metric], current_iter
                )
            self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        log_str = f"Validation {dataset_name}\n"
        for metric, value in self.metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
            if hasattr(self, "best_metric_results"):
                rec = self.best_metric_results[dataset_name][metric]
                log_str += f"\tBest: {rec['val']:.4f} @ {rec['iter']} iter"
            log_str += "\n"
        get_root_logger().info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{dataset_name}/{metric}", value, current_iter)

    # ------------------------------------------------------------------ #
    # save
    # ------------------------------------------------------------------ #

    def save(self, epoch: int, current_iter: int) -> None:
        nets = {"params": jax.tree_util.tree_map(np.asarray, self.params)}
        if self.params_ema is not None:
            nets["params_ema"] = jax.tree_util.tree_map(np.asarray, self.params_ema)
        self.save_network(nets, self.opt["path"]["models"], "net_g", current_iter)
        self.save_training_state(self.opt["path"]["training_states"], epoch, current_iter)
