"""Test configuration.

Unit tests run on the CPU backend with 8 virtual devices so that sharding
/ multi-chip code paths are exercised without TPU hardware. These env vars
must be set before JAX is first imported, which is why they live here.

Set ALLWAVE_TEST_TPU=1 to let tests use the real configured platform.
"""

import os

if not os.environ.get("ALLWAVE_TEST_TPU"):
    # NOTE: this environment preloads an `axon` TPU plugin via a
    # sitecustomize hook that force-sets jax_platforms="axon,cpu", so the
    # JAX_PLATFORMS env var alone is NOT enough — override the config
    # after import as well.
    os.environ["JAX_PLATFORMS"] = "cpu"
    # CLI subprocess tests can't run the in-process config override, so
    # route them through allwave's own platform knob (read by
    # utils.jaxcache.enable_compilation_cache before first device use)
    os.environ["ALLWAVE_PLATFORM"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
