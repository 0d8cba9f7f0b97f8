"""Test configuration: force CPU jax with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); the driver separately dry-runs the sharded path.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter start and
# pins jax_platforms; tests run on a virtual 8-device CPU mesh instead
# (LIME_TEST_TPU=1 opts back into the real chip).
if not os.environ.get("LIME_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "build", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import pytest  # noqa: E402

from .synth import SynthDataset, make_dataset  # noqa: E402


@pytest.fixture(scope="session")
def dataset(tmp_path_factory) -> SynthDataset:
    """Session-wide synthetic paired-end dataset with built indexes."""
    root = tmp_path_factory.mktemp("synth")
    return make_dataset(str(root), num_pairs=400, read_len=100,
                        genome_lens=(9000, 7000, 5000), seed=7)


@pytest.fixture(scope="session")
def oracle():
    """Compiled reference binaries (skips oracle tests if unavailable)."""
    from .oracle import OracleBinaries

    try:
        return OracleBinaries.build()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {e}")
