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


def pytest_collection_modifyitems(config, items):
    """Skip `slow` tests on plain directory runs only.

    An explicit file/node-id selection always runs what was asked (a bare
    `-m 'not slow'` in addopts silently deselected explicitly-named slow
    tests — easy to misread as a pass).  Full suite: RNNT_FULL_TESTS=1 or
    any -m expression.
    """
    import pytest

    if config.option.markexpr or os.environ.get("RNNT_FULL_TESTS"):
        return
    paths = [a for a in config.invocation_params.args
             if not a.startswith("-")]
    if any("::" in a or a.rstrip("/").endswith(".py") for a in paths):
        return  # user named a file or test: run it, slow or not
    skip = pytest.mark.skip(
        reason="slow (run with RNNT_FULL_TESTS=1, -m slow, or name the file)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
