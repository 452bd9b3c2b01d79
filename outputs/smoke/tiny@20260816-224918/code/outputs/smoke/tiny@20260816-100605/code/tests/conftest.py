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
