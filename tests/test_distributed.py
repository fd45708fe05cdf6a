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


@pytest.mark.timeout(600)
def test_two_process_distributed_batch():
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
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        out, err = proc.communicate(timeout=540)
        outs.append((proc.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"WORKER{pid}-OK" in out
