"""Test configuration: run everything on CPU with 8 virtual devices.

Sharding tests need a multi-device mesh; per the project plan we validate
multi-chip code paths on a virtual CPU mesh (the driver separately dry-runs
the multi-chip path). Must be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var route (JAX_PLATFORMS=cpu) is overridden by TPU plugin
# registration in some environments; the config API wins reliably.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from seqalign_tpu.models import ScoringModel, load_builtin


def pytest_collection_modifyitems(items):
    """Every test not marked ``slow`` is the fast tier: ``pytest -m fast``
    is the per-commit set (<60 s), the full suite (incl. the differential
    matrix and 2-process multihost tests) is the nightly set."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def blosum62():
    return load_builtin(
        "BLOSUM62",
        ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False),
    )


@pytest.fixture(scope="session")
def pam250():
    return load_builtin(
        "PAM250",
        ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False),
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_protein(rng, length):
    """Random residues drawn from the 20 standard amino acids."""
    aas = "ACDEFGHIKLMNPQRSTVWY"
    return "".join(aas[i] for i in rng.integers(0, len(aas), size=length))
