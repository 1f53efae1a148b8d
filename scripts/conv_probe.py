"""Isolate the CHW conv kernel's bottleneck on chip.

Variants of the _body3 inner loop at the alignment-chain shape
(Cin=Cout=64, 182x322 canvas, grid ns+2), each timed as a scan over many
calls inside one program:

  full     — DMA + 3-copy im2col + 3 dy-matmuls + epilogue (the real kernel)
  nobuild  — DMA + ONE im2col copy (dx=0 only) + 3 dy-matmuls (wrong math,
             isolates the im2col build cost)
  onedy    — DMA + build + 1 dy-matmul (isolates matmul count)
  dmaonly  — DMA + trivial epilogue (isolates the slab DMA)
  pipelined — double-buffered imcol: step s issues its 3 dy-matmuls from
             imcol[s%2] into INDEPENDENT accumulators, then builds
             imcol[(s+1)%2] for the next slab before summing + epilogue —
             probes whether Mosaic overlaps the VPU im2col copies with the
             MXU matmul stream

Interpreting: full - nobuild ~= 2 im2col copies; full - onedy ~= 2 matmuls;
dmaonly ~= DMA floor.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from savsr_tpu.ops.pallas.chw_conv import layout_params, _round_up


def make_kernel(variant, cin, cout, th, wp, ns, kpad):
    block = th * wp
    el2 = (th + 2) * wp

    if variant == "pipelined":
        return make_pipelined(cin, cout, th, wp, ns, kpad)
    if variant in ("pingpong", "pingpong192"):
        return make_pingpong(cin, cout, th, wp, ns, kpad,
                             k192=variant.endswith("192"))

    def body(x_ref, w_ref, w9_ref, bias_ref, mask_ref, o_ref, imcol, xslab, sem,
             imcol2=None):
        bi = pl.program_id(0)
        s = pl.program_id(1)

        def slab_dma(slot, step):
            start = block + ((step - 1) * th - 1) * wp - 128
            return pltpu.make_async_copy(
                x_ref.at[bi, :, pl.ds(start, el2 + 256)], xslab.at[slot],
                sem.at[slot],
            )

        @pl.when((s == 0) & (ns >= 1))
        def _warm():
            slab_dma(1, 1).start()

        @pl.when((s >= 1) & (s < ns))
        def _prefetch():
            slab_dma((s + 1) % 2, s + 1).start()

        if kpad > 3 * cin:
            @pl.when((bi == 0) & (s == 0))
            def _zero():
                imcol[pl.ds(3 * cin, kpad - 3 * cin), :] = jnp.zeros(
                    (kpad - 3 * cin, el2), imcol.dtype)

        @pl.when((s >= 1) & (s <= ns))
        def _compute():
            slot = s % 2
            slab_dma(slot, s).wait()
            if variant == "dmaonly":
                o_ref[:] = xslab[slot, :, pl.ds(0, block)].astype(o_ref.dtype)
                return
            if variant == "direct9":
                # no im2col at all: 9 dots on (possibly misaligned) xslab
                # lane slices — probes whether Mosaic feeds misaligned
                # N-operands cheaply
                a = None
                for dy in range(3):
                    for dx in range(3):
                        off = 127 + dx + dy * wp
                        d = jax.lax.dot_general(
                            w9_ref[pl.ds((dy * 3 + dx) * cout, cout), :],
                            xslab[slot, :, pl.ds(off, block)],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        a = d if a is None else a + d
                y = a + bias_ref[0]
                y = 0.6 * y + 0.4 * jnp.abs(y)
                y = y * mask_ref[:]
                o_ref[:] = y.astype(o_ref.dtype)
                return
            if variant == "overlap":
                # dots stream from imcol (stale contents, wrong math) while
                # the im2col copies land in the UNUSED half of xslab's spare
                # space... no — land in imcol2 (separate scratch): no data
                # hazard with the dots, so IF Mosaic/the core can overlap
                # VPU copies with the MXU stream, this costs ~max(36, 17)
                # rather than the sum
                a = jax.lax.dot_general(
                    w_ref[pl.ds(0, cout), :], imcol[:, pl.ds(0, block)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for dy in range(1, 3):
                    a += jax.lax.dot_general(
                        w_ref[pl.ds(dy * cout, cout), :],
                        imcol[:, pl.ds(dy * wp, block)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                for dx in range(3):
                    imcol2[pl.ds(dx * cin, cin), :] = xslab[
                        slot, :, pl.ds(127 + dx, el2)]
                y = a + bias_ref[0] + imcol2[pl.ds(0, cout), pl.ds(0, block)].astype(jnp.float32)
                y = 0.6 * y + 0.4 * jnp.abs(y)
                y = y * mask_ref[:]
                o_ref[:] = y.astype(o_ref.dtype)
                return
            ncopy = 1 if variant == "nobuild" else 3
            for dx in range(ncopy):
                imcol[pl.ds(dx * cin, cin), :] = xslab[slot, :, pl.ds(127 + dx, el2)]
            ndy = 1 if variant == "onedy" else 3
            if variant == "k192":
                # contract over the LOGICAL K = 3*cin (192), not the padded
                # kpad (256): probes whether the MXU streams 1.5 K-passes
                # for a logical 192 vs 2 full passes for an explicit 256
                a = jax.lax.dot_general(
                    w_ref[pl.ds(0, cout), pl.ds(0, 3 * cin)],
                    imcol[pl.ds(0, 3 * cin), pl.ds(0, block)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for dy in range(1, 3):
                    a += jax.lax.dot_general(
                        w_ref[pl.ds(dy * cout, cout), pl.ds(0, 3 * cin)],
                        imcol[pl.ds(0, 3 * cin), pl.ds(dy * wp, block)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                a = jax.lax.dot_general(
                    w_ref[pl.ds(0, cout), :], imcol[:, pl.ds(0, block)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for dy in range(1, ndy):
                    a += jax.lax.dot_general(
                        w_ref[pl.ds(dy * cout, cout), :],
                        imcol[:, pl.ds(dy * wp, block)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            if variant == "noepi":
                o_ref[:] = a.astype(o_ref.dtype)
                return
            y = a + bias_ref[0]
            y = 0.6 * y + 0.4 * jnp.abs(y)
            y = y * mask_ref[:]
            o_ref[:] = y.astype(o_ref.dtype)

        @pl.when((s < 1) | (s > ns))
        def _guard():
            o_ref[:] = jnp.zeros_like(o_ref)

    return body


def make_pipelined(cin, cout, th, wp, ns, kpad):
    block = th * wp
    el2 = (th + 2) * wp

    def body(x_ref, w_ref, w9_ref, bias_ref, mask_ref, o_ref, imcol, xslab, sem):
        bi = pl.program_id(0)
        s = pl.program_id(1)

        def slab_dma(slot, step):
            start = block + ((step - 1) * th - 1) * wp - 128
            return pltpu.make_async_copy(
                x_ref.at[bi, :, pl.ds(start, el2 + 256)], xslab.at[slot],
                sem.at[slot],
            )

        def build(islot, xslot):
            for dx in range(3):
                imcol[islot, pl.ds(dx * cin, cin), :] = xslab[
                    xslot, :, pl.ds(127 + dx, el2)
                ]

        if kpad > 3 * cin:
            @pl.when((bi == 0) & (s == 0))
            def _zero():
                z = jnp.zeros((kpad - 3 * cin, el2), imcol.dtype)
                imcol[0, pl.ds(3 * cin, kpad - 3 * cin), :] = z
                imcol[1, pl.ds(3 * cin, kpad - 3 * cin), :] = z

        # guard step: fetch slab 1 and build its imcol so compute step 1
        # starts with a ready buffer
        @pl.when((s == 0) & (ns >= 1))
        def _warm():
            slab_dma(1, 1).start()
            slab_dma(1, 1).wait()
            build(1 % 2, 1 % 2)

        @pl.when((s >= 1) & (s <= ns))
        def _compute():
            islot = s % 2

            @pl.when(s < ns)
            def _prefetch():
                slab_dma((s + 1) % 2, s + 1).start()

            # independent accumulators: no dot->dot dependency chain, so
            # the scheduler is free to interleave the next-slab build
            a0 = jax.lax.dot_general(
                w_ref[pl.ds(0, cout), :], imcol[islot, :, pl.ds(0, block)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a1 = jax.lax.dot_general(
                w_ref[pl.ds(cout, cout), :], imcol[islot, :, pl.ds(wp, block)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a2 = jax.lax.dot_general(
                w_ref[pl.ds(2 * cout, cout), :],
                imcol[islot, :, pl.ds(2 * wp, block)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(s < ns)
            def _build_next():
                slab_dma((s + 1) % 2, s + 1).wait()
                build((s + 1) % 2, (s + 1) % 2)

            y = a0 + a1 + a2 + bias_ref[0]
            y = 0.6 * y + 0.4 * jnp.abs(y)
            y = y * mask_ref[:]
            o_ref[:] = y.astype(o_ref.dtype)

        @pl.when((s < 1) | (s > ns))
        def _guard():
            o_ref[:] = jnp.zeros_like(o_ref)

    return body


def make_pingpong(cin, cout, th, wp, ns, kpad, k192=False):
    """Correct-math pipelined kernel: TWO STATIC imcol refs (a/b) with a
    parity branch — statically distinct buffers let the scheduler overlap
    step s's build (VPU) with step s's dots (MXU), which a dynamic
    imcol.at[slot] (the 'pipelined' variant) defeats."""
    block = th * wp
    el2 = (th + 2) * wp
    kdot = 3 * cin if k192 else kpad

    def body(x_ref, w_ref, w9_ref, bias_ref, mask_ref, o_ref, imcol_a,
             xslab, sem, imcol2=None):
        imcol_b = imcol2
        bi = pl.program_id(0)
        s = pl.program_id(1)

        def slab_dma(slot, step):
            start = block + ((step - 1) * th - 1) * wp - 128
            return pltpu.make_async_copy(
                x_ref.at[bi, :, pl.ds(start, el2 + 256)], xslab.at[slot],
                sem.at[slot],
            )

        def build(im, xslot):
            for dx in range(3):
                im[pl.ds(dx * cin, cin), :] = xslab[xslot, :, pl.ds(127 + dx, el2)]

        def dots(im):
            a = jax.lax.dot_general(
                w_ref[pl.ds(0, cout), pl.ds(0, kdot)],
                im[pl.ds(0, kdot), pl.ds(0, block)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for dy in (1, 2):
                a += jax.lax.dot_general(
                    w_ref[pl.ds(dy * cout, cout), pl.ds(0, kdot)],
                    im[pl.ds(0, kdot), pl.ds(dy * wp, block)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return a

        def epi(a):
            y = a + bias_ref[0]
            y = 0.6 * y + 0.4 * jnp.abs(y)
            y = y * mask_ref[:]
            o_ref[:] = y.astype(o_ref.dtype)

        if kpad > 3 * cin and not k192:
            @pl.when((bi == 0) & (s == 0))
            def _zero():
                z = jnp.zeros((kpad - 3 * cin, el2), imcol_a.dtype)
                imcol_a[pl.ds(3 * cin, kpad - 3 * cin), :] = z
                imcol_b[pl.ds(3 * cin, kpad - 3 * cin), :] = z

        # guard step 0: fetch slab 1 and build its imcol (buffer a — odd
        # steps read a, even read b)
        @pl.when((s == 0) & (ns >= 1))
        def _warm():
            slab_dma(1, 1).start()
            slab_dma(1, 1).wait()
            build(imcol_a, 1)

        def compute(mine, other):
            # fully straight-line: dots from my buffer; meanwhile the NEXT
            # slab's DMA lands and its build fills the other (static)
            # buffer. The step clamp (min(s+1, ns)) keeps the last step
            # balanced (it redundantly re-fetches slab ns into the dead
            # buffer) so no pl.when fences the dots/build interleave.
            nxt = jnp.minimum(s + 1, ns)
            slab_dma((s + 1) % 2, nxt).start()
            a = dots(mine)
            slab_dma((s + 1) % 2, nxt).wait()
            build(other, (s + 1) % 2)
            epi(a)

        @pl.when((s >= 1) & (s <= ns) & (s % 2 == 1))
        def _odd():
            compute(imcol_a, imcol_b)

        @pl.when((s >= 1) & (s <= ns) & (s % 2 == 0))
        def _even():
            compute(imcol_b, imcol_a)

        @pl.when((s < 1) | (s > ns))
        def _guard():
            o_ref[:] = jnp.zeros_like(o_ref)

    return body


def run_variant(variant, h=180, w=320, cin=64, cout=64, reps=600):
    th, ns, wp, block, s_total, guard = layout_params(h, w)
    kpad = _round_up(3 * cin, 128)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, cin, s_total)), dt)
    wt = jnp.asarray(0.05 * rng.standard_normal((3 * cout, kpad)), dt)
    wt9 = jnp.asarray(0.05 * rng.standard_normal((9 * cout, cin)), dt)
    bias = jnp.asarray(rng.standard_normal((1, cout, 1)), jnp.float32)
    from savsr_tpu.ops.pallas.chw_conv import _pad_mask
    mask = jnp.asarray(_pad_mask(h, w))

    kernel = make_kernel(variant, cin, cout, th, wp, ns, kpad)

    def one(x):
        if variant in ("overlap", "pingpong", "pingpong192"):
            def wrapped(x_ref, w_ref, w9_ref, b_ref, m_ref, o_ref, imcol,
                        xslab, sem, imcol2):
                kernel(x_ref, w_ref, w9_ref, b_ref, m_ref, o_ref.at[0],
                       imcol, xslab, sem, imcol2=imcol2)
        else:
            def wrapped(x_ref, w_ref, w9_ref, b_ref, m_ref, o_ref, imcol,
                        xslab, sem):
                kernel(x_ref, w_ref, w9_ref, b_ref, m_ref, o_ref.at[0],
                       imcol, xslab, sem)

        scratch = [
            pltpu.VMEM(
                ((2, kpad, (th + 2) * wp) if variant == "pipelined"
                 else (kpad, (th + 2) * wp)), dt),
            pltpu.VMEM((2, cin, (th + 2) * wp + 256), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if variant in ("overlap", "pingpong", "pingpong192"):
            scratch.append(pltpu.VMEM((kpad, (th + 2) * wp), dt))

        return pl.pallas_call(
            wrapped,
            out_shape=jax.ShapeDtypeStruct((1, cout, s_total), dt),
            grid=(1, ns + 2),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda bi, s: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cout, block), lambda bi, s: (bi, 0, s),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )(x, wt, wt9, bias, mask)

    def make_many(n):
        @jax.jit
        def many(x):
            def bodyf(c, _):
                y = one(c)
                return y, None
            y, _ = jax.lax.scan(bodyf, x, None, length=n)
            return y.astype(jnp.float32).mean()
        return many

    # slope method: per-conv = (t(2N) - t(N)) / N — cancels the ~25 ms
    # relay dispatch that drowns absolute single-program timings
    n = reps
    m1, m2 = make_many(n), make_many(2 * n)
    float(m1(x)); float(m2(x))
    return x, m1, m2, n


def measure(x, m1, m2, n):
    t1 = min(_timed(m1, x) for _ in range(3))
    t2 = min(_timed(m2, x) for _ in range(3))
    return (t2 - t1) / n * 1e6  # us per conv call


def _timed(f, x):
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


if __name__ == "__main__":
    import sys

    variants = sys.argv[1:] or ["full", "pipelined"]
    reps = int(os.environ.get("REPS", 600))
    rounds = int(os.environ.get("ROUNDS", 3))
    # compile once per variant, then interleave timing rounds: the chip's
    # background load drifts on the ~minute scale, so per-variant minima
    # over interleaved rounds are the only comparable numbers
    progs = {v: run_variant(v, reps=reps) for v in variants}
    best = {v: float("inf") for v in variants}
    for r in range(rounds):
        for v in variants:
            t = measure(*progs[v])
            best[v] = min(best[v], t)
            print(f"  round {r}: {v:10s} {t:8.1f} us/conv", flush=True)
    for v in variants:
        print(f"{v:10s} {best[v]:8.1f} us/conv (min of {rounds})")
