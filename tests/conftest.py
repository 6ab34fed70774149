"""Test harness: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware (SURVEY.md §4);
the driver's dryrun_multichip does the same via __graft_entry__.py.
Env must be set before jax is first imported.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize pins JAX_PLATFORMS=axon (real TPU) at interpreter
# start; the env var is ignored, so force CPU through the config API instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA-CPU wrong-numerics flake, PINNED (scripts/probe_coldflake.py,
# results_chain/probe_coldflake.log): with async dispatch, 2/10 fresh
# processes produced shifted spec-serving streams on their FIRST iteration
# (correct on every later rep of the same process); with synchronous
# dispatch, 0/10. The corruption is a race between async CPU execution and
# concurrent cold compilation (same family as the known backend_compile
# segfault) — NOT an engine bug. Synchronous dispatch costs nothing here
# (single CPU core, nothing to overlap) and removes the failure mode.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the upstream torch reference for golden parity tests."""
    if not reference_available():
        pytest.skip("reference repo not available")
    return REFERENCE_DIR


def randomize_head(params, key=11, scale=0.5):
    """Give a fresh GPT param tree a non-zero output head.

    init_gpt_params zero-inits `output` (reference parity, gpt.py:302-307) —
    so EVERY freshly-initialized model emits identically-zero logits, and any
    test that compares logits/argmax/sampled tokens across two compute paths
    passes VACUOUSLY (zero == zero; sampled streams depend only on the rng).
    Tests that assert numeric parity must run through this first.
    """
    p = dict(params)
    p["output"] = jax.numpy.asarray(
        jax.random.normal(jax.random.key(key), p["output"].shape,
                          p["output"].dtype) * scale)
    return p
