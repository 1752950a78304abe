"""Multi-host data feeding: disjoint loader coverage + a REAL 2-process run.

The reference's multi-GPU story was torch DistributedSampler + NCCL
(DRT/dataloader/exactmatch_dataloader.py:17-25, run_random_sampling.py:59-61)
and was never tested (SURVEY.md §4).  Here the per-host feeding contract is
unit-tested single-process, and then an actual ``jax.distributed`` 2-process
CPU run (2 hosts x 4 devices) exercises index assembly + dp training."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.data.loaders import DataLoader
from denseretrievaltoolkits_tpu.utils.distributed import host_corpus_bounds


def _ident(rows):
    return rows


def test_strided_shards_are_disjoint_and_complete():
    """Train-loader sharding: every example lands on exactly one host."""
    data = list(range(103))
    seen = []
    for idx in range(4):
        dl = DataLoader(data, 4, _ident, shuffle=False, shard_num=4, shard_idx=idx)
        rows = [r for batch in dl for r in batch]
        seen.append(set(rows))
    union = set().union(*seen)
    assert union == set(range(103))
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b]), f"hosts {a},{b} overlap"


def test_shuffled_strided_shards_are_disjoint():
    """Same-seed shuffles on every host partition each epoch's permutation."""
    data = list(range(64))
    loaders = [
        DataLoader(data, 4, _ident, shuffle=True, seed=3, shard_num=2, shard_idx=i)
        for i in range(2)
    ]
    for ep in range(2):
        rows = []
        for dl in loaders:
            dl.set_epoch(ep)
            rows.append({r for batch in dl for r in batch})
        assert not (rows[0] & rows[1])
        # drop_last may trim a trailing partial batch, never duplicate
        assert len(rows[0]) + len(rows[1]) <= 64


def test_contiguous_bounds_cover_corpus():
    """host_corpus_bounds windows tile [0, n) exactly, in order, and line up
    with the sharded-index per-device row count."""
    for n, n_proc, local in [(103, 2, 4), (64, 4, 2), (7, 2, 4), (8, 8, 1)]:
        per = -(-n // (n_proc * local))
        prev_stop = 0
        for p in range(n_proc):
            start, stop = host_corpus_bounds(n, n_proc, p, local)
            assert start == prev_stop
            assert stop - start <= local * per
            prev_stop = stop
        assert prev_stop == n


def test_shard_bounds_loader_slices_contiguously():
    data = list(range(20))
    dl = DataLoader(data, 3, _ident, shuffle=False, shard_bounds=(5, 12))
    rows = [r for batch in dl for r in batch]
    assert rows == list(range(5, 12))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_run():
    """REAL multi-host: 2 jax.distributed processes x 4 virtual CPU devices.
    Covers make_array_from_process_local_data batch assembly, multi-host
    sharded-index materialization, exact global search, and a dp=8 step."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "MH_OK" in out, f"proc {i} no OK marker:\n{out[-3000:]}"
    # both hosts computed the SAME global loss from their local batch slices
    losses = [out.split("loss=")[1].split()[0] for out in outs]
    assert losses[0] == losses[1], f"loss mismatch across hosts: {losses}"
