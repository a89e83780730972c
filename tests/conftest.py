import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware (the driver separately dry-runs multi-chip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# fp64 on CPU for numerics parity with the fp64 reference
jax.config.update("jax_enable_x64", True)

REF = "/root/reference"
SIMPLE = os.path.join(REF, "examples", "simple")
