"""Test harness: run everything on a virtual 8-device CPU mesh.

The container boots with an `axon` TPU PJRT plugin pre-registered at
interpreter start (sitecustomize), so env vars are too late — switch the
platform through jax.config before any backend is initialized (SURVEY.md §4:
multi-device tests on CPU device-count forcing).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Never read/write the persistent compilation cache from tests: XLA:CPU AOT
# entries are host-specific and a stale one deadlocks the 8-device rendezvous
# (CLAUDE.md gotcha; SIGABRTed the suite on a fresh host in round 2).
jax.config.update("jax_enable_compilation_cache", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute full-stack tests (XLA-compile heavy); run the "
        "fast subset on 1-core hosts with -m 'not slow'",
    )
