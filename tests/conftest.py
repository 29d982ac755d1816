import os

# Force CPU with 8 virtual devices BEFORE jax initializes, so multi-chip
# sharding paths are exercised everywhere tests run.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_arv(tmp_path_factory):
    """A tiny synthetic ARV dataset: trimmed DB + moment DB + word embeds.

    4 base + 2 val-novel + 2 test-novel classes, deterministic contents.
    Mirrors the shipped JSON schemas exactly.
    """
    from tests.fixtures import build_tiny_arv

    root = tmp_path_factory.mktemp("tiny_arv")
    return build_tiny_arv(str(root))
