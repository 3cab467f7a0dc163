"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware in this environment exposes a single chip (via the axon
tunnel plugin); all sharding tests run against a host-platform mesh so
multi-chip layouts are validated everywhere (the driver separately dry-runs
the multichip path). The axon plugin must be disabled (it registers itself
regardless of JAX_PLATFORMS), hence clearing PALLAS_AXON_POOL_IPS.

Set CIRCUITS_TPU_TEST_REAL=1 to run the suite on the real TPU instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("CIRCUITS_TPU_TEST_REAL"):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

if not os.environ.get("CIRCUITS_TPU_NO_CACHE"):
    from circuits_halo2_tpu.utils import jaxcache  # noqa: E402

    jaxcache.enable()
