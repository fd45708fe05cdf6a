"""Driver-harness entry points (__graft_entry__) must work as the driver
calls them: plain import + direct call, no env setup by the caller.

Round-1 regression: dryrun_multichip asserted on the ambient device count
instead of provisioning the virtual mesh itself (MULTICHIP_r01 rc=1)."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert all(bool(jax.numpy.isfinite(o).all()) for o in out)


def test_dryrun_inline_when_devices_available():
    # conftest provisions 8 virtual CPU devices, so this runs in-process.
    __graft_entry__.dryrun_multichip(4)


def test_dryrun_self_provisions_in_driver_conditions():
    """Simulate the driver: a process whose JAX sees ONE device imports the
    module and calls dryrun_multichip directly.  It must subprocess itself
    onto a virtual mesh and pass."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # no virtual-device flag: the parent has 1 device
    child = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n"
        "print('SELF-PROVISIONED-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    assert "SELF-PROVISIONED-OK" in proc.stdout
