"""Hardware probe: Mosaic in-kernel dynamic_gather (VERDICT r4 item 2).

XLA's flat (N,) gather costs ~18 ms per 2M rays regardless of table size
(scripts/gather_bench.py) — a compiler lowering floor, not an HBM limit.
Mosaic exposes per-vreg gathers via jnp.take_along_axis (lowered to
tpu.dynamic_gather along sublanes [0] or lanes [1]). This probe answers,
on real hardware:

  1. Do both axes compile + run correctly for i32?
  2. What is the per-op throughput (ops/cycle per (8,128) vreg gather)?
  3. What does a full 2-level per-128-ray-span texel lookup cost per 2M
     rays as a function of table-vreg visits per span?

If (3) lands well under the ~31 ms XLA sample pass, a coherent-gather
texture kernel (visit lists over table vregs, like the tracer's chunk
gates) is worth building; if not, PERF.md records the refutation.

Run on an IDLE chip: python scripts/gather_kernel_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def probe_correctness():
    """dg[1] (lanes) and dg[0] (sublanes) vs numpy on one vreg."""
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 2**31, (8, 128), np.int32)
    c = rng.integers(0, 128, (8, 128), np.int32)
    r = rng.integers(0, 8, (8, 128), np.int32)

    def k_lane(tab_ref, c_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], c_ref[...], axis=1)

    def k_sub(tab_ref, r_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], r_ref[...], axis=0)

    out = pl.pallas_call(k_lane,
                         out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                         interpret=_interpret())(jnp.asarray(tab),
                                                 jnp.asarray(c))
    ok_lane = (np.asarray(out) == tab[np.arange(8)[:, None], c]).all()
    out = pl.pallas_call(k_sub,
                         out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                         interpret=_interpret())(jnp.asarray(tab),
                                                 jnp.asarray(r))
    ok_sub = (np.asarray(out) == tab[r, np.arange(128)[None, :]]).all()
    print(f"dg lanes[1] correct: {ok_lane}   dg sublanes[0] correct: {ok_sub}",
          flush=True)
    return ok_lane and ok_sub


def _span_lookup(tab_ref, out_ref, *, n_blocks: int, reps: int):
    """Per-128-ray-span 2-level texel lookup, visiting `n_blocks` table
    vregs per span: the coherent-gather inner loop. Index rows are
    synthesized in-kernel (iota mixes) — the probe measures gather + select
    cost, not index math fidelity."""
    R = out_ref.shape[1]
    acc = jnp.zeros((8, R), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, R), 1)
    for rep in range(reps):
        # per-span flat index in [0, 1024): varies per rep to defeat CSE
        f = (lane * 7 + rep * 13) % 1024
        c = f % 128
        r = f // 128
        for b in range(n_blocks):
            tab = tab_ref[8 * b:8 * (b + 1), :]           # (8, 128) vreg
            g = jnp.take_along_axis(tab, c, axis=1)       # g[a,l]=tab[a,c_l]
            v = jnp.take_along_axis(g, r, axis=0)         # v[a,l]=tab[r_l,c_l]
            acc = acc + v
    out_ref[...] = acc


def probe_throughput():
    """Cost per (2-gather span x table-vreg) visit, amortized."""
    for n_blocks, reps in ((1, 64), (4, 16), (8, 8)):
        tab = jnp.asarray(
            np.random.default_rng(1).integers(0, 1 << 30, (64, 128),
                                              np.int32))
        n_spans = 4096   # grid: each step = one 128-lane span, 8 sublanes
        kern = pl.pallas_call(
            functools.partial(_span_lookup, n_blocks=n_blocks, reps=reps),
            grid=(n_spans,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128 * n_spans), jnp.int32),
            interpret=_interpret(),
        )

        @jax.jit
        def run(tab):
            return jnp.sum(kern(tab)[:, :8])

        float(run(tab))  # compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tab))
            best = min(best or 9e9, time.perf_counter() - t0)
        visits = n_spans * reps * n_blocks
        per_visit_ns = best / visits * 1e9
        # scale to the config-7 shape: 2M rays, 2 mip levels, 3 channels
        spans_2m = 2 * 1024 * 1024 // 128
        est_ms = per_visit_ns * spans_2m * n_blocks * 2 * 3 / 1e6
        print(f"blocks/span={n_blocks:2d}: {per_visit_ns:7.1f} ns per "
              f"(span,vreg) 2-gather visit -> est {est_ms:6.2f} ms per "
              f"2M-ray trilinear sample pass at that visit rate", flush=True)


def main():
    if not probe_correctness():
        print("dynamic_gather INCORRECT on this backend — abort", flush=True)
        return
    probe_throughput()


if __name__ == "__main__":
    main()
