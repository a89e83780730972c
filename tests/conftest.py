import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware (the driver separately dry-runs multi-chip).
# NOTE: this image's sitecustomize registers the axon TPU-tunnel plugin
# at interpreter start and forces jax_platforms="axon,cpu", so the env
# var is ignored — override through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp64 on CPU for numerics parity with the fp64 reference
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

REF = "/root/reference"
SIMPLE = os.path.join(REF, "examples", "simple")
