"""Test configuration: force the CPU backend with 8 virtual devices so the
suite runs anywhere and sharding tests exercise a real (virtual) mesh.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
# registers the plugin at interpreter start; backends are created lazily, so
# overriding the config here (before any backend use) still wins.
# RZ_TPU_TESTS=1 keeps the real TPU backend for the @pytest.mark.tpu module:
#   RZ_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -m tpu -q
ON_TPU = os.environ.get("RZ_TPU_TESTS") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

ASSET_DIR = pathlib.Path("/root/reference/web/public")
MODEL2 = ASSET_DIR / "models/塞尔凯特2/塞尔凯特2.pmx"
MODEL1 = ASSET_DIR / "models/塞尔凯特/塞尔凯特.pmx"
POOL_VMD = ASSET_DIR / "animations/pool.vmd"
BOOM_VMD = ASSET_DIR / "animations/boom.vmd"


@pytest.fixture(scope="session")
def model2_path():
    if not MODEL2.exists():
        pytest.skip("reference assets not available")
    return str(MODEL2)


@pytest.fixture(scope="session")
def model1_path():
    if not MODEL1.exists():
        pytest.skip("reference assets not available")
    return str(MODEL1)


@pytest.fixture(scope="session")
def pool_vmd_path():
    if not POOL_VMD.exists():
        pytest.skip("reference assets not available")
    return str(POOL_VMD)


@pytest.fixture(scope="session")
def pmx_model2(model2_path):
    from reze_tpu.formats.pmx import load_pmx

    return load_pmx(model2_path)


@pytest.fixture(scope="session")
def pmx_model1(model1_path):
    from reze_tpu.formats.pmx import load_pmx

    return load_pmx(model1_path)


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.tpu tests unless RZ_TPU_TESTS=1 (real chip run)."""
    if ON_TPU:
        return
    skip = pytest.mark.skip(reason="TPU-hardware test: run with RZ_TPU_TESTS=1")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
