"""Pallas/Mosaic DMA-pipelined panorama row gather (EXPERIMENT: refuted).

The MCL measurement phase reads one bins-last LUT row per particle
(`slam_tpu.ops.lut.panorama_rows`). The hypothesis: XLA's `rows[idx]`
gather serializes per-row HBM latency, and explicit asynchronous DMAs —
each grid step owning a block of particles with `slots` row copies
HBM->VMEM in flight — would hide it (`raycast.cpp:225-242` is the semantic
ancestor; the row fetch is the TPU re-expression of its per-beam map walk).

Measured on v5e (2026-08, RESULTS.md "Pallas" section): the hypothesis is
WRONG on both counts.
  * Mosaic cannot DMA single rows of a 2D HBM table (slices must respect
    the (8,128)/(32,128) dtype tiling); the kernel only compiles with a
    fully FLAT layout — 1D source, 1D output, rows padded to 1024-element
    slices.
  * The flat variant runs at 77-102 ns/row (u8 1024B rows, 16-64 slots,
    VMEM or HBM destination) vs XLA's 60 ns/row on the same table — and
    XLA does aligned bf16/f32 1KB rows at 34 ns/row. XLA's gather lowering
    already pipelines row fetches at the DMA-issue floor.

The useful discovery was the ALIGNMENT sensitivity (360-bin rows gather
1.6-1.8x slower than padded ones), productionized as `lut.pad_lut_rows` —
pure XLA, no kernel. This module stays as the documented experiment; the
kernel is deterministic and the CPU suite validates it in interpret mode
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, rows_ref, out_ref, sem, *, block: int, slots: int):
    blk = pl.program_id(0)
    base = blk * block

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            rows_ref.at[idx_ref[base + i]],
            out_ref.at[i],
            sem.at[slot],
        )

    def warm(i, _):
        get_dma(i, i).start()
        return _

    jax.lax.fori_loop(0, slots, warm, None, unroll=True)

    def body(i, _):
        get_dma(i % slots, i).wait()
        nxt = i + slots

        @pl.when(nxt < block)
        def _start():
            get_dma(nxt % slots, nxt).start()

        return _

    jax.lax.fori_loop(0, block, body, None)


@functools.partial(jax.jit, static_argnames=("block", "slots", "interpret"))
def gather_rows(
    rows: jax.Array,
    idx: jax.Array,
    *,
    block: int = 1024,
    slots: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """out[i] = rows[idx[i]] via DMA pipelining.

    rows: [R, C] table resident in HBM. idx: i32[N], values in [0, R).
    Returns [N, C] in rows.dtype. N is padded up to a multiple of `block`
    internally (extra rows fetch row 0 and are dropped).
    """
    n = idx.shape[0]
    n_pad = -(-n // block) * block
    idx_p = jnp.pad(idx, (0, n_pad - n)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, rows.shape[1]),
            lambda b, idx_ref: (b, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, block=block, slots=slots),
        out_shape=jax.ShapeDtypeStruct((n_pad, rows.shape[1]), rows.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(128 * 1024 * 1024),
        ),
    )(idx_p, rows)
    return out[:n]
