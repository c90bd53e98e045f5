"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic (DP/ring contrastive/all-gather heads) is tested on
host CPU devices — the reference never had a single-process multi-rank
harness (SURVEY §4.7); we do.
"""

import os
import sys

# the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and overrides the
# env var at import, so force the platform through jax.config; tests run on a
# virtual 8-device CPU mesh unless explicitly requested otherwise
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# tests run hub-less: the deterministic hash tokenizer is fine for
# shape/loss-math coverage (real training must fail loudly without the
# SigLIP sentencepiece — multitask.MultitaskModel.tokenizer)
os.environ.setdefault("STREAMFORMER_ALLOW_HASH_TOKENIZER", "1")

if os.environ.get("STREAMFORMER_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def torch_reference_models():
    """Import the reference torch model package as a parity oracle.

    We run (never copy) the reference on CPU to generate golden outputs.
    Skipped when the reference tree is not mounted.
    """
    if not has_reference():
        pytest.skip("reference tree not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    cfg_mod = importlib.import_module("models.configuration_streamformer")
    model_mod = importlib.import_module("models.modeling_timesformer_siglip")
    return cfg_mod, model_mod


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
