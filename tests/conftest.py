"""Test configuration: force CPU with an 8-device virtual mesh + float64.

The driver benches on the real TPU chip; tests validate numerics at float64
on CPU (mirroring the reference's float64/esig validation regime,
`notebooks/signature_kernel.ipynb`) and exercise multi-chip sharding on a
virtual device mesh per SURVEY.md §4.
"""

import os

# hard override: the ambient environment sets JAX_PLATFORMS=axon (TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import zlib  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already have been imported by a pytest plugin with the ambient
# JAX_PLATFORMS=axon; override through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True)
def _deterministic_module_rng(request):
    """Reseed each test module's shared ``RNG`` from the test's nodeid.

    Several test modules draw from a module-level ``np.random.RandomState``;
    without this, the draws a test sees depend on which tests ran before it
    in the same xdist worker, making failures irreproducible in isolation.
    """
    mod = getattr(request.node, "module", None)
    rng = getattr(mod, "RNG", None)
    if rng is not None:
        rng.seed(zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF)
