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

import jax  # noqa: E402

# jax may already have been imported by a pytest plugin with the ambient
# JAX_PLATFORMS=axon; override through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
