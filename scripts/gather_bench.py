"""Texture-gather layout sweep on real TPU — isolates the config-7 cliff.

The trilinear sampler's hot op is a row gather from the mip atlas
(shade._bilinear_level). LADDER config 7 measured 4.1 Mrays/s and the
microbench put one 2M-ray sample pass at 139 ms — ~30x over the modeled
~1 gathered row/cycle. This sweep times each candidate gather layout at
2M indices against small (VMEM-resident) and large (HBM-resident) tables
so the fix targets the actual mechanism instead of the model:

  rows3_u32   (T,3)-u32 table, one (N,) row gather     [current data4q]
  rows3_f32   (T,3)-f32 table, one (N,) row gather     [current data 1-tap]
  flat_u32_x3 3 separate (T,) u32 tables, 3 (N,) flat gathers
  flat_u32_x1 1 (T,) u32 table, 1 (N,) flat gather     [RGBA8 1-word texel]
  flat_f32_x1 1 (T,) f32 table, 1 flat gather          [baseline element]
  flat_sorted 1 (T,) u32 table, indices pre-sorted     [coherence probe]

Run: python scripts/gather_bench.py  (idle chip only — see CLAUDE.md)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

K_ITERS = 8
N = 2 * 1024 * 1024


def timed(fn, idx):
    jfn = jax.jit(fn)
    float(jfn(idx))  # compile + warm
    t0 = time.perf_counter()
    # fetch-drained: scalar fetch ends the timed window (CLAUDE.md TIMING)
    s = float(jfn(idx))
    dt = (time.perf_counter() - t0) / K_ITERS
    return dt, s


def make_rows(table, t_rows):
    def run(idx):
        def body(c, k):
            i = (idx + k) % t_rows
            g = table[i].astype(jnp.float32)  # (N, 3)
            return c + g.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_ITERS))
        return c
    return run


def make_flat(tables, t_rows):
    def run(idx):
        def body(c, k):
            i = (idx + k) % t_rows
            g = sum(t[i].astype(jnp.float32) for t in tables)  # (N,)
            return c + g.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_ITERS))
        return c
    return run


def make_rows2(table, t_rows):
    """Trilinear shape probe: the sampler's two mip-level row gathers as
    (a) two N-index gathers vs (b) one fused 2N-index gather — answers
    whether per-gather-op overhead (vs per-row cost) is worth fusing
    `shade._sample_texture`'s l0/l1 fetches into one op."""
    def run_two(idx):
        def body(c, k):
            i = (idx + k) % t_rows
            j = (idx * 7 + k) % t_rows
            g = table[i].astype(jnp.float32) + table[j].astype(jnp.float32)
            return c + g.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_ITERS))
        return c

    def run_fused(idx):
        def body(c, k):
            i = (idx + k) % t_rows
            j = (idx * 7 + k) % t_rows
            g = table[jnp.concatenate([i, j])].astype(jnp.float32)
            return c + g.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_ITERS))
        return c

    return run_two, run_fused


def main():
    rng = np.random.default_rng(0)
    print(f"# {N} indices x {K_ITERS}-iter scans; ms per pass")
    for t_rows, label in [(64 * 64, "small table (4k rows, VMEM)"),
                          (512 * 512 * 4 // 3, "large table (349k rows)"),
                          (2048 * 2048, "xl table (4.2M rows)")]:
        idx = jnp.asarray(rng.integers(0, t_rows, size=N), jnp.int32)
        idx_sorted = jnp.sort(idx)
        t_u32_3 = jnp.asarray(
            rng.integers(0, 2**31, size=(t_rows, 3)), jnp.uint32)
        t_f32_3 = jnp.asarray(rng.uniform(size=(t_rows, 3)), jnp.float32)
        flat3 = tuple(jnp.asarray(np.asarray(t_u32_3)[:, k]) for k in range(3))
        flat1_u = flat3[0]
        flat1_f = jnp.asarray(np.asarray(t_f32_3)[:, 0])
        print(f"## {label}")
        for name, fn, ix in [
            ("rows3_u32", make_rows(t_u32_3, t_rows), idx),
            ("rows3_f32", make_rows(t_f32_3, t_rows), idx),
            ("flat_u32_x3", make_flat(flat3, t_rows), idx),
            ("flat_u32_x1", make_flat((flat1_u,), t_rows), idx),
            ("flat_f32_x1", make_flat((flat1_f,), t_rows), idx),
            ("flat_sorted", make_flat((flat1_u,), t_rows), idx_sorted),
        ] + list(zip(("rows3_2xN", "rows3_1x2N"),
                     make_rows2(t_u32_3, t_rows), (idx, idx))):
            dt, _ = timed(fn, ix)
            print(f"  {name:12s} {dt*1e3:9.2f} ms "
                  f"({N/dt/1e6:8.1f} Mrows/s)")


if __name__ == "__main__":
    main()
