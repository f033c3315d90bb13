"""Test harness: force an 8-virtual-device CPU platform before JAX loads so
pjit/Mesh sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Override (not setdefault): the session exports JAX_PLATFORMS=axon (the
# real TPU tunnel) and the axon sitecustomize re-forces it via
# jax.config.update at interpreter start — so env vars alone are not
# enough.  Update the config *after* import, before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")
REF_DATA = REFERENCE / "dstc2_data" / "processed_data" / "raw"


@pytest.fixture(scope="session")
def ref_valid_path():
    p = REF_DATA / "valid"
    if not p.exists():
        pytest.skip("reference valid shard not available")
    return str(p)


@pytest.fixture(scope="session")
def ref_memory():
    """Reference memory bundle as our Memory object (golden source)."""
    p = REF_DATA / "memory.pt"
    if not p.exists():
        pytest.skip("reference memory.pt not available")
    from nbest_asr_tpu.data.vocab import Memory

    return Memory.from_torch_pt(str(p))


@pytest.fixture(scope="session")
def tiny_memory():
    """Small synthetic label hierarchy for unit tests: 2 special groups
    (pad/unk), singleton tops, and two multi-bottom groups with NONE-last."""
    from nbest_asr_tpu.data.etl import build_memory

    labels = [
        "inform-food-chinese",
        "inform-food-indian",
        "request-phone",
        "thankyou",
        "confirm-area-north",
        "confirm-area-south",
        "negate",
    ]
    words = "i want chinese food in the north please thank you".split()
    return build_memory(words * 2, labels, ["inform", "food"])
