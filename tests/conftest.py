"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

NB: this environment pre-imports jax with JAX_PLATFORMS=axon (TPU tunnel) via
sitecustomize, so the env-var route is too late — the config update below is
the reliable way to pin tests to CPU, and XLA_FLAGS must be appended before
the first backend use.
"""

import os

# Tiny model input + shallow backbone for CLI end-to-end tests (must precede
# package import).  Tests needing the full ResNet-101 depth pass
# backbone_layers=(3, 4, 23, 3) explicitly.
os.environ.setdefault("DSRL_TPU_MODEL_INPUT_SIZE", "64x128")
os.environ.setdefault("DSRL_TPU_BACKBONE_LAYERS", "1,1,2,1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# DSRL_TPU_TESTS_ON_TPU=1 leaves jax on the default (TPU) backend so the
# hardware-gated tests (tests/test_pallas_tail_tpu.py) run compiled instead
# of skipping; everything else still passes there, just slower.
_ON_TPU = os.environ.get("DSRL_TPU_TESTS_ON_TPU") == "1"
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the CLI end-to-end tests trigger ~10 full-model
# CPU compiles; caching makes warm reruns several times faster.  The CPU
# directory is keyed by the host's CPU feature set (see
# utils/fsutil.py::compile_cache_dir): /tmp moves between hosts here, and a
# cross-machine XLA:CPU AOT entry loads with mismatched ISA features —
# observed as wrong numerics (a convergence test's eval accuracy halved) and
# SIGABRT, with only an E-log warning ("may lead to SIGILL").
from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      compile_cache_dir("tpu" if _ON_TPU else "cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    return np.random.default_rng(54321)
