"""Test harness: run everything on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers a remote-TPU ("axon") PJRT backend
and force-sets jax_platforms at interpreter start, so the JAX_PLATFORMS env
var alone is not enough — we must re-update the config before any backend is
initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# the image exports JAX_PLATFORMS=axon globally and
# enable_compilation_cache() re-honors the env var (so CLI users can
# override the sitecustomize force-set) — tests must override the ENV, not
# just the config, or the first NeRFSystem construction flips it back
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat test runs skip XLA compiles entirely
from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
