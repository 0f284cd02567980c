"""True multi-process DCN-path test: two JAX processes (4 virtual CPU
devices each) joined with jax.distributed + gloo collectives render one
frame over the hybrid ("rays" over DCN+ICI, "prims" inside ICI) mesh from
parallel/multihost.py, and each process checks its addressable shards
against a locally-computed single-device reference.

This exercises what the single-process 8-device suite cannot: real
process_count() > 1 mesh construction (host-major "rays" ordering), the
bounce loop's cross-process pmax early-exit, the prim-merge pmin, and the
final psum riding actual inter-process collectives — the reference has no
distributed analog at all (SURVEY.md §2C).

Tolerance is 1e-3 max abs (the BASELINE quality gate): cross-process
reductions may reorder float sums, so exact equality with the local
reference is not expected (~6e-5 observed).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
rank = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
# the parent strips PYTHONPATH so the axon sitecustomize pin never loads,
# but force the backend through config too (CLAUDE.md: the env var alone
# does not override an already-registered pin)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{{port}}", 2, rank)
import numpy as np
from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.parallel import multihost, sharding as sh
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

assert jax.process_count() == 2
scene = build_scene(procedural.scene_multi_torus(analytic=True))
cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
st = RenderSettings.default(max_depth=2)
mesh = multihost.make_hybrid_mesh(n_prim_shards=2)
assert mesh.shape == {{"rays": 4, "prims": 2}}
# host-major "rays": this process's devices form contiguous mesh rows
rows = {{d.process_index for d in mesh.devices[:2].flatten()}}
assert rows == {{0}}, rows
out = sh.render_sharded(scene, cam, 64, 64, st, mesh=mesh, backend="jnp")
ref = np.asarray(render(scene, cam, 64, 64, st)["image"])
worst = 0.0
for s in out["image"].addressable_shards:
    worst = max(worst, float(np.abs(np.asarray(s.data) - ref[s.index]).max()))
assert worst < 1e-3, worst
row0, nrows = multihost.host_band(64, 64)
assert (row0, nrows) == ((0, 32) if rank == 0 else (32, 32))
print(f"RANK_OK {{rank}} worst={{worst:.2e}}", flush=True)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_two_process_dcn_render(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # OS-assigned free port: a fixed one collides with concurrent runs and
    # the failure would be masked as a skip
    import socket
    with socket.socket() as sk:
        sk.bind(("localhost", 0))
        port = str(sk.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for r in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process workers timed out (no gloo support?)")
    for r, (p, out) in enumerate(zip(procs, outs)):
        tail = out[-2000:]
        if p.returncode != 0 and "distributed" in tail and "initialize" in tail:
            pytest.skip(f"jax.distributed unavailable: {tail[-300:]}")
        assert p.returncode == 0, f"rank {r} failed:\n{tail}"
        assert f"RANK_OK {r}" in out, tail
