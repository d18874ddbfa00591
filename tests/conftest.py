"""Test configuration: force the CPU backend with 8 virtual devices.

This is the standard way to test pod-shaped JAX code without a pod
(SURVEY.md §4): sharding/collective tests see an 8-device mesh; everything
else runs on CPU. Note: this environment pre-imports jax at interpreter
startup (axon sitecustomize), so env vars are too late — we use
jax.config.update, which works because backend selection is lazy.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
