"""Test env: force the CPU backend with an 8-device virtual mesh.

Must run before the jax BACKEND initializes (SURVEY §4: the standard JAX
fake-backend trick for testing pjit/sharding code without a pod). The
container's sitecustomize auto-registers (and may pre-import) the axon TPU
plugin when PALLAS_AXON_POOL_IPS is set, which costs ~40s per process —
tests always run on CPU. jax may thus already be in sys.modules when this
conftest runs; that is fine as long as no backend has been created yet, so
we redirect via jax.config and then assert the invariant that actually
matters: CPU platform, 8 virtual devices.
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    # Pre-imported by sitecustomize: the env vars above were read too late
    # for jax's config defaults, so set the platform explicitly. XLA_FLAGS
    # is still honored because it is read at backend-creation time.
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend, got %s" % jax.devices()[0].platform)
assert len(jax.devices()) == 8, (
    "tests need the 8-device virtual CPU mesh, got %d" % len(jax.devices()))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
