"""Real multi-PROCESS distributed runtime test (DCN analog on CPU).

Round 1 left parallel/distributed.py as an untested wrapper.  Here two OS
processes join one JAX distributed runtime over a localhost coordinator
(each contributing 2 virtual CPU devices), build a global 4-device mesh, and
run a batched deconvolution with the batch sharded across processes — the
multi-host recipe from the module docstring, executed for real.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])

from ics_tpu.parallel.distributed import initialize, local_batch_slice

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4  # 2 virtual CPU devices per process

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from ics_tpu.ops.windows import uniform_kernel
from ics_tpu.models.rl_mm import _solve
from ics_tpu.ops.reductions import whiteness_weights

mk, m = 3, 17
pad = mk // 2
B = 4
rng = np.random.default_rng(0)
images = np.clip(rng.random((B, m, m, 3)), 0.05, 0.95).astype(np.float32)
us = np.stack([
    np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge") for im in images
]).astype(np.float32)
psfs = np.stack([np.dstack([uniform_kernel(mk)] * 3)] * B).astype(np.float32)

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("batch",))
sl = local_batch_slice(B)
assert sl == slice(pid * 2, pid * 2 + 2), sl

def put(host_arr):
    # each process contributes only ITS slice — the multi-host contract
    sharding = NamedSharding(mesh, P("batch"))
    return jax.make_array_from_process_local_data(sharding, host_arr[sl])

images_g, us_g, psfs_g = put(images), put(us), put(psfs)
w = jnp.asarray(whiteness_weights(m - 2 * pad - 2, m - 2 * pad - 2))

@jax.jit
def run(images, us, psfs):
    def one(image, u, psf):
        u_out, _uf, psf_out, *_ = _solve(
            image, u, psf, w,
            top=pad + 1, bottom=m - pad - 1, left=pad + 1, right=m - pad - 1,
            tau=0.0, step_factor=1e-3, lambd=1000.0, iterations=2,
            blind=True, correlation=False, use_tv=False,
            conv_method="direct", psf_grad="conv", inner_loop="xla",
            use_stopping=False,
        )
        return u_out, psf_out
    return jax.vmap(one)(images, us, psfs)

u_b, psf_b = run(images_g, us_g, psfs_g)
u_host = multihost_utils.process_allgather(u_b, tiled=True)
assert u_host.shape == images.shape
assert np.isfinite(u_host).all()

# cross-check lane 0 against a plain single-process solve on this host
# (identical solver config — on synthetic inputs the DoF blend is chaotic,
# so backend-different-but-correct op orders diverge)
from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

single = richardson_lucy_MM(
    images[0], us[0], psfs[0], pad + 1, m - pad - 1, pad + 1, m - pad - 1,
    tau=0.0, iterations=2, step_factor=1e-3, lambd=1000.0, blind=True,
    config=RLConfig(conv_method="direct", psf_grad="conv", inner_loop="xla"),
)
np.testing.assert_allclose(u_host[0], np.asarray(single.u), atol=1e-5)
print(f"WORKER{pid}-OK")
"""


_WORKER_BATCH = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])

from ics_tpu.parallel.distributed import initialize, local_batch_slice

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4  # 2 virtual CPU devices per process

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from ics_tpu.ops.windows import uniform_kernel
from ics_tpu.parallel.batch import batched_deconvolve

mk, m = 3, 17
pad = mk // 2
B = 4
rng = np.random.default_rng(0)
images = np.clip(rng.random((B, m, m, 3)), 0.05, 0.95).astype(np.float32)
us = np.stack([
    np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge") for im in images
]).astype(np.float32)
psfs = np.stack([np.dstack([uniform_kernel(mk)] * 3)] * B).astype(np.float32)
box = dict(top=pad + 1, bottom=m - pad - 1, left=pad + 1, right=m - pad - 1)
kw = dict(iterations=3, step_factor=1e-3, lambd=1000.0, blind=True,
          use_stopping=True)

# --- multi-host path: each process feeds only ITS local_batch_slice ---
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("batch",))
sl = local_batch_slice(B)
assert sl == slice(pid * 2, pid * 2 + 2), sl

def put(host_arr):
    sharding = NamedSharding(mesh, P("batch"))
    return jax.make_array_from_process_local_data(sharding, host_arr[sl])

u_b, psf_b, stats_b = batched_deconvolve(
    put(images), put(us), put(psfs), mesh=mesh, schedule="shard_map",
    **box, **kw,
)
u_g = multihost_utils.process_allgather(u_b, tiled=True)
psf_g = multihost_utils.process_allgather(psf_b, tiled=True)
stats_g = multihost_utils.process_allgather(stats_b, tiled=True)
assert u_g.shape == images.shape
assert np.isfinite(u_g).all()

# --- single-process expectation: same lanes through schedule='map', no
# mesh, on this host alone.  shard_map lanes trace unbatched exactly like
# lax.map lanes, so per-lane outputs (including each lane's own whiteness
# stopping iteration in stats[:, 0]) must match to float32 noise. ---
u_1, psf_1, stats_1 = batched_deconvolve(
    images, us, psfs, schedule="map", **box, **kw,
)
np.testing.assert_allclose(u_g, np.asarray(u_1), atol=1e-5)
np.testing.assert_allclose(psf_g, np.asarray(psf_1), atol=1e-5)
np.testing.assert_array_equal(stats_g[:, 0], np.asarray(stats_1)[:, 0])
print(f"WORKER{pid}-OK")
"""


def _run_two_process(worker_src):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, addr, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        # hard in-test deadline (pytest-timeout is not installed, so a
        # @pytest.mark.timeout would silently no-op); a hung coordinator
        # is killed rather than stalling the suite
        for proc in procs:
            out, err = proc.communicate(timeout=540)
            outs.append((proc.returncode, out, err))
    except subprocess.TimeoutExpired:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
                proc.communicate()
        pytest.fail("distributed workers exceeded the 540s deadline")
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"WORKER{pid}-OK" in out


def test_two_process_distributed_batch():
    _run_two_process(_WORKER)


def test_two_process_batched_deconvolve_end_to_end():
    """VERDICT r4 item 7: `batched_deconvolve` itself across 2 processes,
    each feeding its `local_batch_slice`, per-lane equal to the
    single-process run (ref analog: SURVEY §2.2 "DCN … batch fan-out")."""
    _run_two_process(_WORKER_BATCH)
