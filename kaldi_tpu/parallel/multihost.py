"""Multi-host (multi-process) distributed runtime.

The reference scales past one machine by launching N independent jobs
through a cluster shim (egs/wsj/s5/utils/queue.pl:25-50, run.pl) and
averaging their models (steps/libs/nnet3/train/common.py get_average_
nnet_model).  The TPU-native replacement is ONE logical program over a
global device mesh spanning processes: `jax.distributed` connects the
processes (DCN / Gloo), every process feeds its local shard of the
batch, and XLA's collectives (psum over the data axis) do exactly the
gradient averaging the reference approximates with model averaging —
same math, every step instead of every iteration (SURVEY §2.13).

Usage (one process per host, mirroring the reference's JOB=1:N
contract):

    from kaldi_tpu.parallel import multihost
    multihost.initialize()          # env: KALDI_TPU_COORDINATOR,
                                    # KALDI_TPU_NUM_PROCS,
                                    # KALDI_TPU_PROC_ID
    mesh = make_mesh(data=jax.device_count(), model=1)
    batch = multihost.make_global_batch(local_arrays, mesh)  # dp
    state, metrics = step_fn(state, batch)   # psum spans hosts

`python -m kaldi_tpu.parallel.multihost --dryrun N` self-validates by
spawning N CPU processes x 4 virtual devices and training a real chain
step in float64, asserting the distributed objective/params match a
single-device computation of the same global batch bit-for-bit at
tolerance (tests/test_multihost.py runs this in CI).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (KALDI_TPU_COORDINATOR, KALDI_TPU_NUM_PROCS, KALDI_TPU_PROC_ID —
    the role of queue.pl's JOB=1:N; on real TPU pods all three are
    auto-detected by jax and may be omitted entirely)."""
    import jax
    coordinator_address = coordinator_address or os.environ.get(
        "KALDI_TPU_COORDINATOR")
    if num_processes is None and "KALDI_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["KALDI_TPU_NUM_PROCS"])
    if process_id is None and "KALDI_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["KALDI_TPU_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def egs_shard(keys: Sequence, process_index: Optional[int] = None,
              num_processes: Optional[int] = None):
    """Deterministic per-process slice of an example list — the
    reference's split_data.sh round-robin, so every process reads a
    disjoint egs subset without coordination."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    np_ = jax.process_count() if num_processes is None else num_processes
    return [k for i, k in enumerate(keys) if i % np_ == pi]


def make_global_batch(local_arrays, mesh, axis: str = "data"):
    """Assemble globally-sharded arrays from per-process local shards
    (leading-axis data parallelism).  Every process passes ITS slice of
    the global batch; the result is one logical array over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(one, local_arrays)


# --------------------------------------------------------------------------
# dryrun: N CPU processes x 4 virtual devices, real chain train step
# --------------------------------------------------------------------------

_WORKER_FLAG = "--worker"


def _worker(num_procs: int, pid: int, port: int) -> None:
    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs, process_id=pid)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from kaldi_tpu.chain.graphs import (DenominatorGraph, PackedGraph,
                                        batch_pack)
    from kaldi_tpu.chain.objective import ChainTrainingOptions
    from kaldi_tpu.chain.supervision import make_denominator_graph
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet3.models import ChainTdnnfConfig
    from kaldi_tpu.parallel.mesh import make_mesh
    from kaldi_tpu.parallel.trainer import (ChainTrainState,
                                            make_chain_train_state,
                                            make_sharded_train_step)
    from kaldi_tpu.tree import monophone_context_dependency

    n_dev = jax.device_count()
    assert jax.process_count() == num_procs, jax.process_count()
    mesh = make_mesh(data=n_dev, model=1, devices=jax.devices())

    cfg = ChainTdnnfConfig(feat_dim=24, num_pdfs=80, hidden_dim=64,
                           bottleneck_dim=16, prefinal_dim=32,
                           num_layers=3, subsample_layer=2,
                           frame_subsampling_factor=3)
    B, T = n_dev, 18
    Tout = T // 3
    state, model, tx = make_chain_train_state(cfg, jax.random.PRNGKey(0),
                                              example_T=T)
    as64 = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    params = as64(state.params)
    bstats = as64(state.batch_stats)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    phones = list(range(1, 11))
    topo = HmmTopology.chain_topology(phones)
    tree = monophone_context_dependency(phones, {p: 2 for p in phones})
    den = make_denominator_graph(
        [rng.integers(1, 11, rng.integers(5, 15)).tolist()
         for _ in range(40)], TransitionModel(topo, tree), tree)
    g = den.graph
    den64 = DenominatorGraph(PackedGraph(
        g.src, g.dst, g.pdf, np.asarray(g.log_prob, np.float64),
        np.asarray(g.initial, np.float64),
        np.asarray(g.final, np.float64)))

    # the GLOBAL batch is seed-deterministic: every process synthesizes
    # all B sequences, feeds only its local slice, and process 0 can
    # verify the distributed result against a single-device step on the
    # full batch — same-math assertion across hosts.
    feats = rng.normal(size=(B, T, cfg.feat_dim))
    nums = []
    for _ in range(B):
        pdfs = rng.integers(0, cfg.num_pdfs, Tout).astype(np.int32)
        ninf = -1e30
        initial = np.full(Tout + 1, ninf, np.float64)
        initial[0] = 0.0
        final = np.full(Tout + 1, ninf, np.float64)
        final[Tout] = 0.0
        nums.append(PackedGraph(
            np.arange(Tout, dtype=np.int32),
            np.arange(1, Tout + 1, dtype=np.int32), pdfs,
            np.zeros(Tout, np.float64), initial, final))
    num_arrays = batch_pack(nums)
    num_arrays = tuple(np.asarray(a, np.float64)
                       if np.issubdtype(np.asarray(a).dtype, np.floating)
                       else np.asarray(a) for a in num_arrays)

    opts = ChainTrainingOptions(l2_regularize=1e-4,
                                leaky_hmm_coefficient=1e-4)
    step_fn = make_sharded_train_step(model, tx, opts, den64, mesh=None,
                                      donate=False)

    # local shard: contiguous block of the global batch
    per = B // num_procs
    lo, hi = pid * per, (pid + 1) * per
    local = {"feats": feats[lo:hi],
             "num_graphs": tuple(a[lo:hi] for a in num_arrays)}
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    st = ChainTrainState(
        jax.device_put(params, jax.tree.map(lambda _: rep, params)),
        jax.device_put(bstats, jax.tree.map(lambda _: rep, bstats)),
        jax.device_put(opt_state, jax.tree.map(
            lambda _: rep, opt_state,
            is_leaf=lambda x: hasattr(x, "shape"))), 0)
    gbatch = {"feats": make_global_batch(local["feats"], mesh),
              "num_graphs": tuple(make_global_batch(a, mesh)
                                  for a in local["num_graphs"])}
    with mesh:
        new_state, metrics = step_fn(st, gbatch)
        objf = float(metrics["objf"])
    print(f"proc {pid}: {num_procs} processes x "
          f"{jax.local_device_count()} devices, global objf {objf:.12f}",
          flush=True)

    # single-device reference on the full global batch (pure local)
    ref_new, ref_m = step_fn(
        ChainTrainState(params, bstats, opt_state, 0),
        {"feats": jnp.asarray(feats),
         "num_graphs": tuple(jnp.asarray(a) for a in num_arrays)})
    ref_objf = float(ref_m["objf"])
    assert abs(objf - ref_objf) <= 1e-9 * max(1.0, abs(ref_objf)), \
        (objf, ref_objf)
    # updated params equivalence: compare the locally-addressable
    # shards of the distributed result against the reference
    worst = 0.0
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_new.params)):
        a_local = np.asarray(
            a.addressable_shards[0].data if hasattr(a, "addressable_shards")
            else a)
        b_np = np.asarray(b)
        worst = max(worst, float(np.max(np.abs(a_local - b_np))))
    assert worst < 1e-6, worst
    print(f"proc {pid}: multihost == single-device (objf "
          f"{objf:.12f} vs {ref_objf:.12f}, worst param absdiff "
          f"{worst:.2e})", flush=True)


def dryrun_multihost(num_procs: int = 2, devices_per_proc: int = 4,
                     timeout: float = 540.0, port: int = 29891) -> None:
    """Spawn num_procs CPU processes x devices_per_proc virtual devices
    and run the distributed chain train step, asserting numeric
    equivalence with a single-device step (see _worker)."""
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for pid in range(num_procs):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_ENABLE_X64"] = "1"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                            f"{devices_per_proc}")
        env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "kaldi_tpu.parallel.multihost",
             _WORKER_FLAG, str(num_procs), str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    fail = False
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            fail = True
        outs.append(out)
        fail = fail or p.returncode != 0
    for pid, out in enumerate(outs):
        sys.stdout.write(f"--- proc {pid} ---\n{out}")
    if fail:
        raise RuntimeError("dryrun_multihost failed")
    print(f"dryrun_multihost OK: {num_procs} processes x "
          f"{devices_per_proc} devices")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == _WORKER_FLAG:
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        n = 2
        if "--dryrun" in sys.argv:
            i = sys.argv.index("--dryrun")
            if i + 1 < len(sys.argv):
                n = int(sys.argv[i + 1])
        dryrun_multihost(n)
