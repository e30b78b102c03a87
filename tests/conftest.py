"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; instead we force the JAX CPU
backend with 8 virtual devices so that every sharding / collective code path
(jax.sharding.Mesh + pjit) is exercised exactly as it would be on a TPU pod
slice.  This mirrors the reference's single-process world_size==1 testing
strategy (see SURVEY.md §4) but actually runs the multi-device code.
"""

import os

# Force-override: the environment may pin JAX_PLATFORMS to a TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook (e.g. a TPU-relay plugin) may have initialized the backend at
# interpreter startup, before the env vars above could take effect.  In that
# case reset and rebuild as CPU with 8 virtual devices so the suite runs the
# same everywhere.
try:
    if jax.devices()[0].platform != "cpu" or jax.device_count() < 8:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        assert jax.device_count() == 8
except Exception:  # pragma: no cover - leave whatever backend exists
    pass

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


def requires_devices(n: int):
    """Skip when the CPU mesh could not be virtualized (e.g. a site hook
    initialized the backend before our flags took effect)."""
    return pytest.mark.skipif(
        jax.device_count() < n,
        reason=f"needs {n} devices, have {jax.device_count()}",
    )
