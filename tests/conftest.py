"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS to the TPU tunnel, but tests
# exercise mesh/pjit code on 8 virtual host devices (override with
# VCP_TEST_PLATFORM=tpu to run against real hardware).
os.environ["JAX_PLATFORMS"] = os.environ.get("VCP_TEST_PLATFORM", "cpu")

# Deterministic answers in tests: production 'auto' resolves to the trained
# LM when the shipped checkpoint declares answer training (pipeline/qa.py::
# lm_answer_available — unit-tested directly); the suite pins extractive so
# artifact-format and citation assertions don't ride model output.
os.environ.setdefault("VCP_ANSWER_ENGINE", "extractive")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon boot hook force-updates jax_platforms to "axon,cpu" via jax.config,
# which beats the env var; update it back before any backend initializes.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from vision_compression_project_tpu.parallel import MeshConfig, build_mesh

    assert len(jax.devices()) == 8
    return build_mesh(MeshConfig(data=2, seq=1, expert=2, model=2))


@pytest.fixture(scope="session")
def mesh_dp():
    """Pure data-parallel 8-way mesh."""
    from vision_compression_project_tpu.parallel import MeshConfig, build_mesh

    return build_mesh(MeshConfig(data=8, seq=1, expert=1, model=1))
