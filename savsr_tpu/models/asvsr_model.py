"""ASVSR trainers — the shipped SAVSR model wrappers.

Counterpart of lbasicsr/models/asvsr_model.py. In the functional design the
reference's ``net_g.module.set_scale(scale)`` host-side mutation becomes a
static argument of the jitted step — feed_data records the batch's scale
tuple and optimize_parameters/test compile one executable per distinct
(shape, scale).
"""

from __future__ import annotations

import math

from ..utils.registry import MODEL_REGISTRY
from .video_base_model import VideoBaseModel
from .video_recurrent_model import ASVideoRecurrentModel


@MODEL_REGISTRY.register()
class ASVSRModel(VideoBaseModel):
    """Windowed arbitrary-scale VSR trainer (model_type of the shipped
    train/test configs)."""

    def optimize_parameters(self, current_iter):
        super().optimize_parameters(current_iter)

    def test(self):
        # eval scale comes from the dataset/test config (asvsr_model.py:31-61)
        if self.opt.get("scale") is not None:
            s = self.opt["scale"]
            self.scale = tuple(s) if isinstance(s, (tuple, list)) else (s, s)
        super().test()


@MODEL_REGISTRY.register()
class ASVSRRecurrentModel(ASVideoRecurrentModel):
    """Recurrent ASVSR trainer: loss over a frame subset, loss-explosion
    guard, bf16 compute as the AMP analogue."""

    def __init__(self, opt):
        super().__init__(opt)
        if "train" in self.opt and self.opt["train"].get("sub_frame") is not None:
            self.sub_frame = self.opt["train"]["sub_frame"]
            nf = self.opt["datasets"]["train"]["num_frame"]
            self.loss_frame_seq = list(range(self.sub_frame, nf - self.sub_frame))
            self.alpha = self.opt["train"].get("alpha", 0)
            # the reference trims the *network output* via net_g(lq, sub_frame)
            # (asvsr_model.py:93); archs that support this expose sub_frame=
            # in apply() and skip computing the trimmed frames
            import inspect

            self._net_takes_sub_frame = (
                "sub_frame" in inspect.signature(self.net_g.apply).parameters
            )

    def _loss_fn(self, trainable, stats, lq, gt, scale, bucket_ops=None):
        if bucket_ops is not None:
            raise NotImplementedError(
                "train: bucket_train is only supported by the windowed "
                "ASVSRModel (the recurrent arch upsamples per frame)"
            )
        params = {**trainable, **stats}
        sub = getattr(self, "sub_frame", None)
        if sub is not None and getattr(self, "_net_takes_sub_frame", False):
            output, stats_updates = self.net_g.apply(
                params, lq, scale, train=True, sub_frame=sub
            )
        else:
            output, stats_updates = self.net_g.apply(params, lq, scale, train=True)
        if sub is not None and output.ndim == 5 and gt.ndim == 5:
            # loss over the interior frames only (reference asvsr_model.py:104):
            # gt is always sliced; the output too when the arch did not already
            # trim it via sub_frame
            if output.shape[1] == gt.shape[1]:
                output = output[:, sub : output.shape[1] - sub]
            gt = gt[:, sub : gt.shape[1] - sub]
        losses = {}
        l_pix = self.cri_pix(output, gt)
        losses["l_pix"] = l_pix
        losses["l_total"] = l_pix
        return l_pix, (losses, stats_updates, output)

    def optimize_parameters(self, current_iter):
        super().optimize_parameters(current_iter)
        # loss-explosion guard (reference asvsr_model.py:109-111)
        l_total = self.log_dict.get("l_total", 0.0)
        if l_total > 5 or l_total < 0 or math.isnan(l_total):
            raise RuntimeError(f"loss error {l_total}")
