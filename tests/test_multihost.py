"""Multi-host distributed runtime (parallel/multihost.py): 2 CPU
processes x 4 virtual devices run the real chain train step over one
global mesh and must match a single-device computation of the same
global batch (float64) — the TPU-native replacement for the
reference's queue.pl + model-averaging outer loop (SURVEY §2.13)."""

import numpy as np
import pytest

from kaldi_tpu.parallel.multihost import dryrun_multihost, egs_shard


def test_egs_shard_partition():
    keys = [f"utt{i}" for i in range(10)]
    s0 = egs_shard(keys, process_index=0, num_processes=3)
    s1 = egs_shard(keys, process_index=1, num_processes=3)
    s2 = egs_shard(keys, process_index=2, num_processes=3)
    assert sorted(s0 + s1 + s2) == sorted(keys)
    assert not (set(s0) & set(s1)) and not (set(s1) & set(s2))


@pytest.mark.slow
def test_multihost_dryrun_two_processes():
    dryrun_multihost(num_procs=2, devices_per_proc=4, timeout=540.0,
                     port=29893)
