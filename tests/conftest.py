"""Test config: run everything on CPU with 8 fake devices.

SURVEY.md §4.5 — distributed logic is tested without a cluster by forcing
the host platform to expose 8 virtual devices. Must run before jax imports.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ARLMT_TPU_TESTS=1 runs the perf tier on the real chip instead
# (tests/test_perf_floor.py): pytest -m tpu with that env set.
_TPU_TIER = os.environ.get("ARLMT_TPU_TESTS") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# the axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override at the config level (wins as long as no arrays
# have been created yet).
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
