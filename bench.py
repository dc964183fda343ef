"""Benchmark: flagship chain TDNN-F acoustic-model forward throughput
on one chip, reported as real-time factor (audio-seconds per second).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the reference's closest published number —
3524x RT for the full batched GPU decode pipeline on a V100
(arXiv:1910.10032, see BASELINE.md); our number covers the AM forward
(features+decoder pipeline lands in later rounds, see README).

Methodology: 10 data-dependent forward passes fused into one jitted
lax.scan with a single host sync at the end — this measures device
compute (the experimental axon platform's block_until_ready does not
reliably synchronize, and per-step host syncs would measure tunnel
latency instead).

Usage: python bench.py [--quick]  (--quick = tiny shapes for smoke
tests on CPU; the driver runs the default on the real chip).
"""

import json
import sys
import time

import numpy as np


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig

    if quick:
        cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=256, hidden_dim=128,
                               bottleneck_dim=32, prefinal_dim=64,
                               num_layers=4, subsample_layer=2)
        B, T = 4, 90
    else:
        # production librispeech chain TDNN-F shape (run_tdnn_1d.sh:
        # 17 layers x 1536, bottleneck 160, ~23M params)
        cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=3456, hidden_dim=1536,
                               bottleneck_dim=160, prefinal_dim=256,
                               num_layers=17, subsample_layer=8)
        B, T = 256, 300  # 256 x 3s chunks per step
    ITERS = 10

    model = ChainTdnnf(cfg, train=False)
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((B, T, cfg.feat_dim), jnp.bfloat16)
    t0 = time.time()
    variables = model.init(rng, feats)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x,
                          variables["params"])
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def forward_chain(params, batch_stats, feats):
        def body(carry, _):
            out, _xent = model.apply(
                {"params": params, "batch_stats": batch_stats}, carry)
            # data dependency so the scan iterations are sequential
            carry = feats + (out.mean() * 0).astype(feats.dtype)
            return carry, out.mean()
        _, means = jax.lax.scan(body, feats, None, length=ITERS)
        return means.sum()

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(B, T, cfg.feat_dim)), jnp.bfloat16)
    v = float(forward_chain(params, batch_stats, x))  # compile + warmup
    compile_s = time.time() - t0
    print(f"# compile+init+warmup: {compile_s:.1f}s (out {v:.3f})",
          file=sys.stderr)

    t0 = time.time()
    v = float(forward_chain(params, batch_stats, x))
    elapsed = time.time() - t0
    audio_seconds = B * T * 0.01 * ITERS  # 10ms frames
    xrt = audio_seconds / elapsed
    baseline = 3524.0  # V100 full-pipeline RTF from arXiv:1910.10032
    print(json.dumps({
        "metric": "chain_tdnnf_am_forward_xRT_per_chip",
        "value": round(xrt, 1),
        "unit": "x realtime",
        "vs_baseline": round(xrt / baseline, 3),
    }))


if __name__ == "__main__":
    main()
