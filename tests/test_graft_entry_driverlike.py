"""Driver-conditions regression tests for __graft_entry__.

Rounds 1-2 both failed the driver's multi-chip dry run with the same bug:
importing ``real_esrgan_tpu`` executed module-level ``jnp.asarray`` constants,
which bound the default backend — the TPU relay — BEFORE the CPU mesh was
forced.  A healthy relay hides the bug (constants land on TPU, backends get
cleared); an unhealthy relay (the driver's libtpu skew) kills the import.

These tests reproduce the driver's environment in a CLEAN subprocess:
  * no conftest.py CPU pre-forcing (conftest runs in THIS process only;
    the subprocess gets a scrubbed env),
  * the accelerator made unreachable: ``JAX_PLATFORMS=axon`` with the axon
    plugin NOT registered (PALLAS_AXON_POOL_IPS unset), so ANY default-backend
    touch raises RuntimeError — exactly as fatal as the driver's relay skew.

Under that env, the package must import with zero backend touches and
``dryrun_multichip(8)`` must still pass (it forces the CPU mesh explicitly,
as the first act — device binding is never an import side effect; reference
point: the reference binds its device exactly once, config.py:68).
"""

import pytest

pytestmark = pytest.mark.heavy

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _poisoned_env() -> dict:
    env = dict(os.environ)
    # Unregister the accelerator plugin but keep JAX_PLATFORMS pointing at it:
    # sitecustomize skips register() without PALLAS_AXON_POOL_IPS, and then
    # any backend touch raises "Backend 'axon' is not in the list of known
    # backends" — a faithful stand-in for the driver's fatally-skewed relay.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "axon"
    # Scrub the test harness's own CPU forcing so the subprocess is clean.
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    return env


def _run(code: str, timeout: int = 600) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_poisoned_env(),
        capture_output=True, text=True, timeout=timeout)


def test_poison_env_is_actually_poisoned():
    """Sanity: in the scrubbed subprocess, a default-backend touch dies."""
    r = _run("import jax; jax.devices()")
    assert r.returncode != 0, "poison env no longer poisons — fix the fixture"
    assert "axon" in r.stderr


def test_package_imports_bind_no_backend():
    """Importing every real_esrgan_tpu module must touch no device backend."""
    r = _run(
        "import pkgutil, importlib\n"
        "import real_esrgan_tpu\n"
        "for m in pkgutil.walk_packages(real_esrgan_tpu.__path__,"
        " 'real_esrgan_tpu.'):\n"
        "    importlib.import_module(m.name)\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_dryrun_multichip_survives_dead_accelerator():
    """The driver's acceptance gate: dryrun_multichip(8) in a clean process
    with the accelerator unreachable must force the CPU mesh and pass."""
    r = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "one fused train step OK" in r.stdout
