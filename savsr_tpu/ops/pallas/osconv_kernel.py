"""Fused OSConv Pallas kernel: scale-conditioned dynamic conv on the MXU.

Performance path for OSConv2d (reference savsr_arch.py:139-172, the model's
hottest op, ~22 executions per 7-frame window). The reference materializes
a ``[B*Cout, Cin, k, k]`` weight and runs a ``groups=B`` conv; the XLA path
(ops/osconv.py) materializes ``[B,H,W,k*k,Cin]`` im2col patches (9x the
activation bytes). This kernel does neither:

  - The four attentions fold into the *small* per-sample aggregated weight
        agg[b,p,i,o] = ca[b,i] * fa[b,o] * sa[b,p] * sum_K ka[b,K] W[K,p,i,o]
    computed in XLA (a few MFLOPs; negligible) — channel attention scales
    conv inputs == scaling the weight's Cin axis, filter attention scales
    outputs == scaling the Cout axis — so activations need zero elementwise
    work and the conv consumes raw x.
  - The conv runs as k*k shifted ``[TH*TW, Cin] x [Cin, Cout]`` MXU matmuls
    per spatial tile over a haloed VMEM tile (each input element read once
    from HBM; f32 accumulation).

Grid: (B, H/TH, W/TW), row-major; agg[b] is DMA'd into VMEM once per batch
sample and reused across its spatial tiles.

Backward, two tiers:
  - ``osconv_fused`` (serving): custom_vjp delegating to the XLA einsum
    formulation (identical math), so the fused forward is usable anywhere.
  - ``osconv_agg_train`` / ``osconv_fused_train`` (training,
    ``osconv_impl: pallas_train``): fully-Pallas backward — dx runs as a
    transpose conv through the SAME forward kernel (spatially flipped taps,
    in/out channel axes swapped, padding kh-1-p), and the per-sample weight
    gradient streams through ``_dagg_kernel`` with the forward's slab
    pattern. Neither direction materializes an im2col patch tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _osconv_kernel(
    x_ref,       # HBM: [kw, B, Hp + kh-1, W, Cin] (pre-padded, pre-shifted)
    agg_ref,     # HBM: [B, P, Cin, Cout] per-sample aggregated weights
    out_ref,     # VMEM block: [1, TH, W, Cout]
    x_slab,      # scratch VMEM: [2, kw, TH + kh-1, W, Cin] (double buffered)
    agg,         # scratch VMEM: [P, Cin, Cout]
    sems,        # DMA semaphores: (2 slab slots, 1 agg)
    *,
    kh: int,
    kw: int,
    tile_h: int,
    w_out: int,
    cin: int,
    cout: int,
    cout_used: int,
    n_rows: int,
    batch: int,
):
    b = pl.program_id(0)
    th = pl.program_id(1)
    step = b * n_rows + th
    total = batch * n_rows

    def slab_copy(slot, bb, tt):
        # one DMA per step: all kw shifted slabs at once (dims 0/1/2 are
        # untiled, so the slice is legal for any dtype tiling)
        return pltpu.make_async_copy(
            x_ref.at[:, bb, pl.ds(tt * tile_h, tile_h + kh - 1), :, :],
            x_slab.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(step, 2)
    nxt = step + 1
    nb = nxt // n_rows
    nth = jax.lax.rem(nxt, n_rows)

    # warm-up: the very first step issues its own slab DMA
    @pl.when(step == 0)
    def _():
        slab_copy(slot, b, th).start()

    # prefetch the next step's slabs into the other slot
    @pl.when(nxt < total)
    def _():
        slab_copy(1 - slot, nb, nth).start()

    # refresh this sample's aggregated weight on its first row slab
    @pl.when(th == 0)
    def _():
        w_copy = pltpu.make_async_copy(agg_ref.at[b], agg, sems.at[2])
        w_copy.start()
        w_copy.wait()

    slab_copy(slot, b, th).wait()

    acc = jnp.zeros((tile_h * w_out, cout_used), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            p = dy * kw + dx
            window = x_slab[slot, dx, dy : dy + tile_h, :, :].reshape(
                tile_h * w_out, cin
            )
            acc = acc + jax.lax.dot_general(
                window,
                agg[p, :, :cout_used],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # pin the contract precision to the operand dtype: the
                # training forward runs under default_matmul_precision
                # ('float32'), whose fp32 contract tag Mosaic rejects on
                # bf16 operands ("Bad lhs type"); bf16 operands already
                # accumulate in f32 via preferred_element_type
                precision=(jax.lax.Precision.HIGHEST
                           if x_slab.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )
    out_ref[0] = acc.reshape(tile_h, w_out, cout_used).astype(out_ref.dtype)


def _pick_tile_h(w: int, cin: int, cout: int, kh: int, kw: int,
                 itemsize: int) -> int:
    """Largest row count whose double-buffered kw slabs + accumulator fit
    ~10MB of VMEM."""
    for th in (64, 32, 16, 8, 4):
        slab = 2 * kw * (th + kh - 1) * w * cin * itemsize
        acc = th * w * cout * 4
        if slab + acc <= 10 * 1024 * 1024:
            return th
    return 4


def osconv_pallas_agg(x: jnp.ndarray, agg_weight: jnp.ndarray, padding: int = 1):
    """Run the row-slab kernel with per-sample weights [B, kh, kw, Cin, Cout]."""
    b, h, w, cin = x.shape
    _, kh, kw, _, cout = agg_weight.shape
    P = kh * kw
    # sliced HBM DMAs require the (lane-tiled) channel dim to be a multiple
    # of 128; zero-pad Cin (the zero channels contribute nothing)
    cpad = (-cin) % 128
    opad = (-cout) % 128
    cout_orig = cout
    if cpad or opad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        agg_weight = jnp.pad(
            agg_weight, ((0, 0), (0, 0), (0, 0), (0, cpad), (0, opad))
        )
        cin = cin + cpad
        cout = cout + opad
    # matmuls/outputs only need the 8-aligned prefix of the 128-padded cout
    cout_round = cout_orig + ((-cout_orig) % 8)
    # general padding (the transpose-conv dx path runs at kh-1-padding):
    # output extent ho x wo, computed on a w_eff-wide (8-aligned) canvas
    ho = h + 2 * padding - kh + 1
    wo = w + 2 * padding - kw + 1
    w_eff = wo + ((-wo) % 8)
    tile_h = _pick_tile_h(w_eff, cin, cout, kh, kw, x.dtype.itemsize)
    n_rows = pl.cdiv(ho, tile_h)
    grid = (b, n_rows)
    x_pad = jnp.pad(
        x,
        (
            (0, 0),
            (padding, n_rows * tile_h + kh - 1 - h - padding),
            (padding, w_eff + kw - 1 - w - padding),
            (0, 0),
        ),
    )
    # stack the kw horizontal shifts in XLA (one cheap HBM copy) so the
    # kernel's DMAs never slice a tiled dimension
    x_shifts = jnp.stack([x_pad[:, :, dx : dx + w_eff, :] for dx in range(kw)], axis=0)

    kernel = functools.partial(
        _osconv_kernel, kh=kh, kw=kw, tile_h=tile_h, w_out=w_eff, cin=cin,
        cout=cout, cout_used=cout_round, n_rows=n_rows, batch=b,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_eff, cout_round),
            lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_rows * tile_h, w_eff, cout_round), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kw, tile_h + kh - 1, w_eff, cin), x.dtype),
            # weights at the input dtype: the MXU dot must be same-typed on
            # both sides (Mosaic rejects bf16 lhs x f32 rhs), and bf16
            # weights match the other engines' bf16-compute numerics; the
            # accumulator stays f32 via preferred_element_type
            pltpu.VMEM((P, cin, cout), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=_interpret(),
    )(x_shifts, agg_weight.reshape(b, P, cin, cout).astype(x.dtype))
    return out[:, :ho, :wo, :cout_orig]


def _dagg_kernel(
    x_ref,       # HBM: [kw, B, Hp + kh-1, W, Cin] (pre-padded, pre-shifted)
    g_ref,       # HBM: [B, Hp, W, Cout] (cotangent, zero-padded)
    out_ref,     # VMEM block: [1, P, Cin, Cout] f32 — revisited across row tiles
    x_slab,      # scratch VMEM: [2, kw, TH + kh-1, W, Cin]
    g_slab,      # scratch VMEM: [2, TH, W, Cout]
    sems,        # DMA semaphores: (2 x slots, 2 g slots)
    *,
    kh: int,
    kw: int,
    tile_h: int,
    w_out: int,
    cin: int,
    cout: int,
    n_rows: int,
    batch: int,
):
    """Per-sample weight gradient: dagg[b,p,i,o] = sum_hw xs_p[b,hw,i]*g[b,hw,o].

    Same slab streaming as the forward (each x element read once from HBM per
    backward, no [B,H,W,P,Cin] patch tensor); the P accumulators live in the
    revisited output block (zeroed on a sample's first row tile)."""
    b = pl.program_id(0)
    th = pl.program_id(1)
    step = b * n_rows + th
    total = batch * n_rows

    def x_copy(slot, bb, tt):
        return pltpu.make_async_copy(
            x_ref.at[:, bb, pl.ds(tt * tile_h, tile_h + kh - 1), :, :],
            x_slab.at[slot],
            sems.at[slot],
        )

    def g_copy(slot, bb, tt):
        return pltpu.make_async_copy(
            g_ref.at[bb, pl.ds(tt * tile_h, tile_h), :, :],
            g_slab.at[slot],
            sems.at[2 + slot],
        )

    slot = jax.lax.rem(step, 2)
    nxt = step + 1
    nb = nxt // n_rows
    nth = jax.lax.rem(nxt, n_rows)

    @pl.when(step == 0)
    def _():
        x_copy(slot, b, th).start()
        g_copy(slot, b, th).start()

    @pl.when(nxt < total)
    def _():
        x_copy(1 - slot, nb, nth).start()
        g_copy(1 - slot, nb, nth).start()

    x_copy(slot, b, th).wait()
    g_copy(slot, b, th).wait()

    @pl.when(th == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    g_flat = g_slab[slot].reshape(tile_h * w_out, cout)
    for dy in range(kh):
        for dx in range(kw):
            p = dy * kw + dx
            window = x_slab[slot, dx, dy : dy + tile_h, :, :].reshape(
                tile_h * w_out, cin
            )
            out_ref[0, p] = out_ref[0, p] + jax.lax.dot_general(
                window,
                g_flat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # see the forward kernel: dtype-pinned contract precision
                precision=(jax.lax.Precision.HIGHEST
                           if x_slab.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )


def _pick_tile_h_dagg(w: int, cin: int, cout: int, kh: int, kw: int,
                      itemsize: int) -> int:
    for th in (64, 32, 16, 8, 4):
        x_slab = 2 * kw * (th + kh - 1) * w * cin * itemsize
        g_slab = 2 * th * w * cout * itemsize
        acc = kh * kw * cin * cout * 4
        if x_slab + g_slab + acc <= 10 * 1024 * 1024:
            return th
    return 4


def osconv_pallas_dagg(x: jnp.ndarray, g: jnp.ndarray, kh: int, kw: int,
                       padding: int = 1) -> jnp.ndarray:
    """Weight-gradient kernel: [B,H,W,Cin] x [B,Ho,Wo,Cout] -> [B,P,Cin,Cout]."""
    b, h, w, cin = x.shape
    cout = g.shape[-1]
    cpad = (-cin) % 128
    opad = (-cout) % 128
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
    if opad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, opad)))
    cin_p, cout_p = cin + cpad, cout + opad
    ho = h + 2 * padding - kh + 1
    wo = w + 2 * padding - kw + 1
    w_eff = wo + ((-wo) % 8)
    tile_h = _pick_tile_h_dagg(w_eff, cin_p, cout_p, kh, kw, x.dtype.itemsize)
    n_rows = pl.cdiv(ho, tile_h)
    x_pad = jnp.pad(
        x,
        (
            (0, 0),
            (padding, n_rows * tile_h + kh - 1 - h - padding),
            (padding, w_eff + kw - 1 - w - padding),
            (0, 0),
        ),
    )
    x_shifts = jnp.stack(
        [x_pad[:, :, dx : dx + w_eff, :] for dx in range(kw)], axis=0
    )
    g_pad = jnp.pad(
        g,
        ((0, 0), (0, n_rows * tile_h - g.shape[1]),
         (0, w_eff - g.shape[2]), (0, 0)),
    )
    P = kh * kw
    kernel = functools.partial(
        _dagg_kernel, kh=kh, kw=kw, tile_h=tile_h, w_out=w_eff, cin=cin_p,
        cout=cout_p, n_rows=n_rows, batch=b,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, cin_p, cout_p),
            lambda bb, i: (bb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, P, cin_p, cout_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, kw, tile_h + kh - 1, w_eff, cin_p), x.dtype),
            pltpu.VMEM((2, tile_h, w_eff, cout_p), g.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
    )(x_shifts, g_pad)
    return out[:, :, :cin, :cout]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def osconv_agg_train(x, agg, padding=1):
    """Trainable fused dynamic conv at the per-sample-weight level: Pallas
    forward AND Pallas backward (dx as a transpose-conv through the forward
    kernel with flipped/io-swapped weights; dagg via the slab-streaming
    weight-grad kernel) — no im2col patch tensor in either direction.

    x [B,H,W,Cin]; agg [B,kh,kw,Cin,Cout]; stride 1."""
    return osconv_pallas_agg(x, agg, padding)


def _agg_train_fwd(x, agg, padding):
    return osconv_pallas_agg(x, agg, padding), (x, agg)


def _agg_train_bwd(padding, residuals, g):
    x, agg = residuals
    kh, kw = agg.shape[1], agg.shape[2]
    # transpose conv: spatially flipped taps, in/out channel axes swapped
    agg_t = jnp.swapaxes(agg[:, ::-1, ::-1], 3, 4)
    dx = osconv_pallas_agg(g, agg_t, kh - 1 - padding)
    dagg = osconv_pallas_dagg(x, g, kh, kw, padding).astype(agg.dtype)
    return dx, dagg.reshape(agg.shape)


osconv_agg_train.defvjp(_agg_train_fwd, _agg_train_bwd)


def osconv_fused_train(x, weight, ca, fa, sa, ka, padding=1):
    """Training-path fused OSConv: attentions fold into the small per-sample
    aggregated weight in XLA (jax AD differentiates the fold — its operands
    are a few MB), the conv itself and BOTH its gradients run as Pallas
    slab-streaming kernels (osconv_agg_train)."""
    agg = _aggregate_weights(weight, ca, fa, sa, ka)
    return osconv_agg_train(x, agg, padding)


def _aggregate_weights(weight, ca, fa, sa, ka):
    """agg[b,p,i,o] with all four attentions folded in (XLA-side)."""
    K, kh, kw, cin, cout = weight.shape
    agg = jnp.einsum("bK,Kklio->bklio", ka, weight)
    agg = agg * sa[:, :, :, None, None]
    agg = agg * ca[:, None, None, :, None]
    agg = agg * fa[:, None, None, None, :]
    return agg


def _reference_math(x, weight, ca, fa, sa, ka, padding):
    from ..osconv import osconv_apply_einsum

    return osconv_apply_einsum(x, _aggregate_weights(weight, ca, fa, sa, ka), 1, padding)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def osconv_fused(x, weight, ca, fa, sa, ka, padding=1):
    """Fused OSConv: raw x + shared bank + attentions -> output.

    x [B,H,W,Cin]; weight [K,kh,kw,Cin,Cout]; ca [B,Cin]; fa [B,Cout];
    sa [B,kh,kw]; ka [B,K]. Stride 1 (all SAVSR instances).
    """
    agg = _aggregate_weights(weight, ca, fa, sa, ka)
    return osconv_pallas_agg(x, agg, padding)


def _fwd(x, weight, ca, fa, sa, ka, padding):
    return osconv_fused(x, weight, ca, fa, sa, ka, padding), (x, weight, ca, fa, sa, ka)


def _bwd(padding, residuals, g):
    x, weight, ca, fa, sa, ka = residuals
    _, vjp = jax.vjp(
        lambda *args: _reference_math(*args, padding), x, weight, ca, fa, sa, ka
    )
    return vjp(g)


osconv_fused.defvjp(_fwd, _bwd)
