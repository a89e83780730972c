"""Real-TPU test lane (VERDICT round-1 item 6).

Unlike tests/ (which pins the 8-virtual-device CPU platform for
sharding logic), this lane runs small correctness checks ON THE REAL
CHIP so a Mosaic/runtime regression cannot ship green:

    cd /root/repo && python -m pytest tpu_tests -q

The driver/bench can invoke it via BENCH_CONFIG=tpulane (bench.py).
Every test here must stay small (seconds of device time, one chip).
"""

import os

import pytest

# fail loudly instead of silently degrading to a slower path while
# under test (sim.py honors HT_STRICT in its auto-mode fallbacks)
os.environ.setdefault("HT_STRICT", "1")

import jax


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason=f"TPU lane needs a real TPU "
                            f"backend (got {jax.default_backend()})")
    for item in items:
        item.add_marker(skip)
