"""Test env: force the CPU backend with an 8-device virtual mesh.

Must run before any jax import (SURVEY §4: the standard JAX fake-backend
trick for testing pjit/sharding code without a pod). The container's
sitecustomize auto-registers the axon TPU plugin when PALLAS_AXON_POOL_IPS is
set, which costs ~40s per process — tests always run on CPU.
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

assert "jax" not in sys.modules, (
    "conftest.py must configure the backend before jax is imported")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
