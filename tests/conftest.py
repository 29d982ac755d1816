import os

# Force CPU with 8 virtual devices so multi-chip sharding paths are exercised
# everywhere tests run. jax may already be imported (the axon sitecustomize
# pre-registers a TPU plugin and sets JAX_PLATFORMS=axon), so both the env var
# and the live config must be overridden before the first backend is built.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
