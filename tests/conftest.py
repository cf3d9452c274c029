"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`xla_force_host_platform_device_count` (the driver separately dry-runs the
multi-chip path through `__graft_entry__.dryrun_multichip`).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The environment's sitecustomize pre-imports jax and registers the TPU
# backend before env vars are read, so BOTH the platform AND the
# persistent compilation cache must be set via the config API (env vars
# like JAX_COMPILATION_CACHE_DIR are read at jax import, which already
# happened — setting them here is a silent no-op).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vslam_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults inside backend_compile_and_load when a large
    scan program is compiled late in a long process (accumulated LLVM/JIT
    state; reproduced 3/3 at ~105 tests, fine standalone — upstream
    compiler bug, TPU unaffected). Dropping the in-memory executable
    caches between modules resets that state; the persistent disk cache
    (enabled above) turns any recompiles into cheap deserializes."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
