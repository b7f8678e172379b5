"""Test configuration: run everything on CPU with 8 virtual devices.

Pallas kernels auto-select interpret mode off-TPU, and the parallel tests
get an 8-device mesh without hardware (SURVEY.md section 4: all kernel tests
must run on CPU; the bench CLI exercises the compiled TPU path).

Note: this environment's sitecustomize force-registers a TPU backend and
sets JAX_PLATFORMS=axon, so env vars alone don't stick — the jax.config
update after import is the authoritative override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
