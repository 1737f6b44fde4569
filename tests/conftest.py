"""Test harness: run everything on a simulated 8-device CPU mesh.

This is the multi-device test story the reference lacks (SURVEY.md §4):
8 virtual CPU devices give sharding parity tests without TPU hardware (the
hinted-at technique in run_rnnt.py:110-113).  Must run before `import jax`
anywhere.

NOTE (this machine): the axon TPU plugin connects to the chip tunnel eagerly
in every JAX process regardless of JAX_PLATFORMS, and the tunnel serves one
client at a time — never run two JAX processes concurrently or they block
each other.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

# The axon sitecustomize imports jax before this conftest runs, so the env
# var alone is too late — force the platform through the live config too
# (otherwise every test silently runs serially over the TPU tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The XLA CPU backend's default matmul precision is bf16-like (~0.2% rel
# error); force full fp32 so numerical parity tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")
