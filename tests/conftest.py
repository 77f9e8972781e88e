"""Test session config.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware — the swtpu analog of the
reference's PSLSE strategy of running the full stack hardware-free
(pslse-master/; SURVEY.md §4 takeaway (c)).  Set SWTPU_TEST_TPU=1 to run
the suite on real devices instead.
"""

import os

if not os.environ.get("SWTPU_TEST_TPU"):
    # jax may already be (pre-)imported by the environment, so env vars are
    # too late for platform selection — use config.update, which takes
    # effect any time before backend initialization.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
