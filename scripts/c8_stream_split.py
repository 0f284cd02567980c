"""Config-8 streamed-kernel time split on hardware (VERDICT r4 item 1).

Times, per 2M-ray primary pass on config 8's real scene (fetch-drained,
K-iteration scan inside one jit with per-iteration input perturbation to
break CSE):

  gate     — the exact XLA visit-list gate + pack alone
  full     — the whole tri_closest_hit_stream call (gate + kernel)
  nodma    — kernel with HBM->VMEM copies disabled (TRT_STREAM_DIAG)
  nospan   — kernel with span dispatch disabled (DMA walk only)

So:  kernel = full - gate;  DMA+walk = nospan - gate;
     span chains = full - nodma (approx).

Each diag mode runs in a SUBPROCESS (the flag is read at module import;
results in diag modes are wrong by design — timing only).

Run: python scripts/c8_stream_split.py [--occlusion]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BODY = r"""
import json, time, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, {root!r})
from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from toroidal_ray_tracing_tpu.experiments.configs import SCENARIOS
from toroidal_ray_tracing_tpu.cameras import generate_rays
from toroidal_ray_tracing_tpu.trace.intersect import geom_from_scene
from toroidal_ray_tracing_tpu.ops.tri_stream import tri_closest_hit_stream
from toroidal_ray_tracing_tpu.ops.trace_kernel import _tri_attr_tables

mode = {mode!r}
occl = {occl!r}
K = 4

sc = SCENARIOS[8]
scene = sc.build()
geom = geom_from_scene(scene)
st = sc.settings()
o, d = generate_rays(sc.camera_at(0), sc.width, sc.height, st, xp=np)
o, d = np.ascontiguousarray(np.asarray(o).T), np.ascontiguousarray(np.asarray(d).T)
n = o.shape[1]
pad = (-n) % 2048
if pad:
    o = np.concatenate([o, np.zeros((3, pad), np.float32)], axis=1)
    d = np.concatenate([d, np.ones((3, pad), np.float32)], axis=1)
tmax = np.full((o.shape[1],), 10000.0, np.float32)
tables = None if occl else _tri_attr_tables(scene, geom)

o_d = jax.device_put(jnp.asarray(o))
d_d = jax.device_put(jnp.asarray(d))
tm_d = jax.device_put(jnp.asarray(tmax))
wo = jax.device_put(geom.woop_o); wd = jax.device_put(geom.woop_d)
clo = jax.device_put(geom.cluster_lo); chi = jax.device_put(geom.cluster_hi)
cs = scene.cluster_size
if tables is not None:
    tables = jax.device_put(tables)

@jax.jit
def run(o_d, d_d, tm_d, wo, wd, clo, chi, tables):
    def step(carry, i):
        oo = o_d + i * 1e-7
        out = tri_closest_hit_stream(oo, d_d, tm_d, wo, wd, clo, chi, cs,
                                     attr_tables=tables, occlusion=occl)
        return carry + jnp.sum(out[0][::4096]), 0
    tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K, dtype=jnp.float32))
    return tot

args = (o_d, d_d, tm_d, wo, wd, clo, chi, tables)
t0 = time.time()
v = float(run(*args))
compile_s = time.time() - t0
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    v = float(run(*args))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"mode": mode, "occl": occl, "ms_per_pass": best / K * 1e3,
                  "compile_s": round(compile_s, 1)}}))
"""

GATE_BODY = r"""
import json, time, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, {root!r})
from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from toroidal_ray_tracing_tpu.experiments.configs import SCENARIOS
from toroidal_ray_tracing_tpu.cameras import generate_rays
from toroidal_ray_tracing_tpu.trace.intersect import geom_from_scene
from toroidal_ray_tracing_tpu.ops import tri_stream
from toroidal_ray_tracing_tpu.ops.kernel_common import (_chunk_visit_lists,
                                                        _pack_visit_rows)

K = 4
sc = SCENARIOS[8]
scene = sc.build()
geom = geom_from_scene(scene)
st = sc.settings()
o, d = generate_rays(sc.camera_at(0), sc.width, sc.height, st, xp=np)
o, d = np.ascontiguousarray(np.asarray(o).T), np.ascontiguousarray(np.asarray(d).T)
n = o.shape[1]
pad = (-n) % 2048
if pad:
    o = np.concatenate([o, np.zeros((3, pad), np.float32)], axis=1)
    d = np.concatenate([d, np.ones((3, pad), np.float32)], axis=1)
tmax = np.full((o.shape[1],), 10000.0, np.float32)

C = geom.cluster_lo.shape[0]
cluster = scene.cluster_size
g = max(1, -(-C // tri_stream.STREAM_GATE_BOXES))
g = min(g, max(1, tri_stream.STREAM_MAX_SB // cluster))
S = -(-C // g)
clo = np.asarray(geom.cluster_lo); chi = np.asarray(geom.cluster_hi)
if S * g != C:
    p = S * g - C
    clo = np.concatenate([clo, np.full((p, 3), 1e30, np.float32)])
    chi = np.concatenate([chi, np.full((p, 3), 1e30, np.float32)])
empty = clo[:, 0:1] > 1e29
chi_eff = np.where(empty, -1e30, chi)
sb_lo = clo.reshape(S, g, 3).min(axis=1)
sb_hi = chi_eff.reshape(S, g, 3).max(axis=1)
ae = empty.reshape(S, g, 1).all(axis=1)
sb_hi = np.where(ae, sb_lo, sb_hi)
rank = np.argsort(np.argsort(np.linalg.norm(
    (sb_lo + sb_hi) / 2 - np.asarray(o).mean(axis=1), axis=1))).astype(np.int32)

o_d = jax.device_put(jnp.asarray(o)); d_d = jax.device_put(jnp.asarray(d))
tm_d = jax.device_put(jnp.asarray(tmax))
lo_d = jax.device_put(jnp.asarray(sb_lo)); hi_d = jax.device_put(jnp.asarray(sb_hi))
rk_d = jax.device_put(jnp.asarray(rank))
nt = o.shape[1] // 1024

@jax.jit
def run(o_d, d_d, tm_d):
    def step(carry, i):
        oo = o_d + i * 1e-7
        ids, bits, cnt = _chunk_visit_lists(oo, d_d, tm_d, lo_d, hi_d,
                                            rk_d, 1024, 128)
        packed, _ = _pack_visit_rows(ids, bits, cnt, nt, S)
        return carry + jnp.sum(packed[0, ::512].astype(jnp.float32)), 0
    tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K, dtype=jnp.float32))
    return tot

t0 = time.time(); v = float(run(o_d, d_d, tm_d)); compile_s = time.time() - t0
best = 9e9
for _ in range(3):
    t0 = time.perf_counter(); v = float(run(o_d, d_d, tm_d))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"mode": "gate", "ms_per_pass": best / K * 1e3,
                  "compile_s": round(compile_s, 1)}}))
"""


def main():
    occl = "--occlusion" in sys.argv
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c",
                          GATE_BODY.format(root=ROOT)],
                         env=env, capture_output=True, text=True,
                         timeout=3000)
    print(out.stdout.strip().splitlines()[-1] if out.stdout.strip()
          else out.stderr[-2000:], flush=True)
    runs = [("full", {"TRT_STREAM_DIAG": "", "TRT_STREAM_GROUP": "0"}),
            ("nodma", {"TRT_STREAM_DIAG": "nodma", "TRT_STREAM_GROUP": "0"}),
            ("nospan", {"TRT_STREAM_DIAG": "nospan",
                        "TRT_STREAM_GROUP": "0"}),
            ("grouped", {"TRT_STREAM_DIAG": "", "TRT_STREAM_GROUP": "16"})]
    for name, envs in runs:
        env.update(envs)
        out = subprocess.run(
            [sys.executable, "-c",
             BODY.format(root=ROOT, mode=name, occl=occl)],
            env=env, capture_output=True, text=True, timeout=3000)
        print(out.stdout.strip().splitlines()[-1] if out.stdout.strip()
              else out.stderr[-2000:], flush=True)


if __name__ == "__main__":
    main()
