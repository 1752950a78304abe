"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

The reference (yhao-wang/DenseRetrievalToolkits) had no tests at all and exercised
distributed behavior only on real multi-GPU launches (SURVEY.md §4).  Here every
multi-device code path is testable on CPU via XLA's host-platform device-count
override, which is JAX's fake-backend story.
"""

import os

# NOTE: this environment's sitecustomize (axon TPU tunnel) imports jax at
# interpreter start, so JAX's config is already latched before conftest runs.
# Setting os.environ alone is NOT enough — use jax.config.update too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# XLA:CPU in-process collectives CHECK-fail (SIGABRT, rendezvous.cc) when a
# participant thread misses the 40 s termination timeout.  On this ONE-core
# container the 8 virtual devices time-slice a single CPU, so the full-size
# bert-base dp4xtp2 step routinely exceeds it (observed 2026-08-17:
# deterministic abort; with the timeout raised the same program finishes).
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep compilation deterministic and quiet in tests.
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
# Zero-egress environment: never let HF libraries attempt network I/O.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
