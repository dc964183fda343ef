"""Round-3 CLI tail batch 7: language/speaker-recognition surface
(parity: src/ivectorbin ivector-adapt-plda.cc, ivector-copy-plda.cc,
ivector-compute-dot-products.cc; src/featbin add-deltas-sdc.cc,
compute-and-process-kaldi-pitch-feats.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def ivector_adapt_plda(argv: List[str]) -> int:
    po = ParseOptions(
        "Unsupervised PLDA domain adaptation from unlabeled "
        "target-domain i-vectors (ivector-adapt-plda.cc).\n"
        "Usage: ivector-adapt-plda [options] <plda-in> "
        "<ivector-rspecifier> <plda-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    within_scale = po.register_value(
        "within-covar-scale", 0.75,
        "Excess-variance share added to the within-class covariance")
    between_scale = po.register_value(
        "between-covar-scale", 0.25,
        "Excess-variance share added to the between-class covariance")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.plda import Plda
    plda = kaldi_io.read_kaldi_object(Plda.read, po.get_arg(1))
    ivs = [np.asarray(v, np.float64) for _k, v in
           SequentialTableReader("vector", po.get_arg(2))]
    if len(ivs) < 2:
        warn("need at least 2 adaptation ivectors")
        return 1
    adapted = plda.adapt(np.stack(ivs),
                         within_covar_scale=within_scale[0],
                         between_covar_scale=between_scale[0])
    kaldi_io.write_kaldi_object(adapted.write, po.get_arg(3), binary[0])
    log(f"adapted PLDA with {len(ivs)} ivectors")
    return 0


def ivector_copy_plda(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy a PLDA model, optionally smoothing the within-class "
        "covariance (ivector-copy-plda.cc).\n"
        "Usage: ivector-copy-plda [options] <plda-in> <plda-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    smoothing = po.register_value(
        "smoothing", 0.0, "Smoothing factor: interpolates the "
        "between-class variances toward their mean "
        "(SmoothWithinClassCovariance-style regularization)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.plda import Plda
    plda = kaldi_io.read_kaldi_object(Plda.read, po.get_arg(1))
    if smoothing[0] > 0:
        s = smoothing[0]
        plda.psi = (1 - s) * plda.psi + s * plda.psi.mean()
    kaldi_io.write_kaldi_object(plda.write, po.get_arg(2), binary[0])
    return 0


def ivector_compute_dot_products(argv: List[str]) -> int:
    po = ParseOptions(
        "Dot products (cosine scores with --normalize) between "
        "i-vector pairs from a trials file of '<key1> <key2>' lines "
        "(ivector-compute-dot-products.cc).\n"
        "Usage: ivector-compute-dot-products [options] "
        "<trials-rxfilename> <ivector1-rspecifier> "
        "<ivector2-rspecifier> <scores-wxfilename>")
    normalize = po.register_value("normalize", True,
                                  "Length-normalize before the dot "
                                  "product (cosine scoring)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    import sys as _sys
    r1 = RandomAccessTableReader("vector", po.get_arg(2))
    r2 = RandomAccessTableReader("vector", po.get_arg(3))
    out = (_sys.stdout if po.get_arg(4) == "-"
           else open(po.get_arg(4), "w"))
    n = err = 0
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        trials = f.read().decode("utf-8").splitlines()
    for line in trials:
        parts = line.split()
        if len(parts) < 2:
            continue
        k1, k2 = parts[0], parts[1]
        if k1 not in r1 or k2 not in r2:
            warn(f"missing ivector for trial {k1} {k2}")
            err += 1
            continue
        a = np.asarray(r1[k1], np.float64)
        b = np.asarray(r2[k2], np.float64)
        if normalize[0]:
            a = a / max(np.linalg.norm(a), 1e-20)
            b = b / max(np.linalg.norm(b), 1e-20)
        out.write(f"{k1} {k2} {float(a @ b):.6f}\n")
        n += 1
    if out is not _sys.stdout:
        out.close()
    log(f"scored {n} trials ({err} missing)")
    return 0 if n else 1


def compute_sdc(feats: np.ndarray, n: int, d: int, p: int,
                k: int) -> np.ndarray:
    """Shifted delta cepstra (add-deltas-sdc.cc; the N-d-P-k
    configuration, classically 7-1-3-7): output row t =
    [c_t[:n], Δ(t), Δ(t+P), ..., Δ(t+(k-1)P)] with
    Δ(u) = c[u+d] - c[u-d], indices edge-clamped."""
    x = np.asarray(feats, np.float64)[:, :n]
    T = x.shape[0]
    t = np.arange(T)

    def at(idx):
        return x[np.clip(idx, 0, T - 1)]

    blocks = [x]
    for i in range(k):
        u = t + i * p
        blocks.append(at(u + d) - at(u - d))
    return np.concatenate(blocks, axis=1).astype(np.float32)


def add_deltas_sdc(argv: List[str]) -> int:
    po = ParseOptions(
        "Append shifted delta cepstra (the language-id feature; "
        "add-deltas-sdc.cc N-d-P-k, default 7-1-3-7).\n"
        "Usage: add-deltas-sdc [options] <feats-rspecifier> "
        "<feats-wspecifier>")
    n_cep = po.register_value("num-cepstra", 7,
                              "N: leading cepstra to use")
    d_opt = po.register_value("delta-spread", 1, "d: delta spread")
    p_opt = po.register_value("block-shift", 3, "P: block shift")
    k_opt = po.register_value("num-blocks", 7, "k: number of blocks")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("matrix", po.get_arg(2))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if feats.shape[1] < n_cep[0]:
            warn(f"{key}: dim {feats.shape[1]} < N={n_cep[0]}")
            continue
        writer.write(key, compute_sdc(feats, n_cep[0], d_opt[0],
                                      p_opt[0], k_opt[0]))
        n += 1
    writer.close()
    log(f"wrote SDC features for {n} utterances "
        f"({n_cep[0]}-{d_opt[0]}-{p_opt[0]}-{k_opt[0]})")
    return 0 if n else 1


def ivector_extract_online(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract i-vectors ONLINE: one row per --ivector-period "
        "frames, each the MAP estimate from all frames seen so far "
        "(ivector-extract-online.cc; the value a streaming decoder "
        "would have had at that point).\n"
        "Usage: ivector-extract-online [options] <extractor-in> "
        "<feats-rspecifier> <ivector-matrix-wspecifier>")
    period = po.register_value("ivector-period", 10,
                               "Frames between outputs")
    max_count = po.register_value(
        "max-count", 0.0, "Soft cap on the stats count (0 = none)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import (IvectorExtractor,
                                             OnlineIvectorEstimationStats)
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read,
                                    po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        feats = np.asarray(feats)
        stats = OnlineIvectorEstimationStats(ex,
                                             max_count=max_count[0])
        rows = []
        for t0 in range(0, feats.shape[0], period[0]):
            stats.acc_frames(feats[t0:t0 + period[0]])
            rows.append(stats.ivector())
        if not rows:
            continue
        writer.write(key, np.stack(rows).astype(np.float32))
        n += 1
    writer.close()
    log(f"online i-vectors for {n} utterances (period {period[0]})")
    return 0 if n else 1


def nnet3_discriminative_train(argv: List[str]) -> int:
    po = ParseOptions(
        "Sequence-discriminative (MMI/MPE/sMBR) fine-tuning of an "
        "xconfig checkpoint from alignments + denominator lattices "
        "(nnet3-discriminative-train.cc; lattice acoustics are "
        "recomputed from the live model every pass).\n"
        "Usage: nnet3-discriminative-train [options] <model-dir-in> "
        "<transition-model-in> <feats-rspecifier> <ali-rspecifier> "
        "<den-lat-rspecifier> <model-dir-out>")
    criterion = po.register_value("criterion", "smbr",
                                  "mmi | mpfe | smbr")
    num_epochs = po.register_value("num-epochs", 2, "Training epochs")
    learning_rate = po.register_value("learning-rate", 1e-4,
                                      "Adam learning rate")
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    import json
    import os
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.discriminative_train import (
        DiscTrainOptions, train_discriminative)
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, \
        parse_xconfig
    from kaldi_tpu.parallel.checkpoint import (restore_checkpoint,
                                               save_checkpoint)
    base = os.path.abspath(po.get_arg(1))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    text = meta["xconfig"]
    model = build_xconfig_model(text, train=False)
    layers = parse_xconfig(text)
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    tm = _read_tm(po.get_arg(2))

    def apply_fn(p, f):
        vs = dict(variables)
        vs["params"] = p
        return model.apply(vs, {"input": f})["output"]

    feats = {k: np.asarray(m) for k, m in
             SequentialTableReader("matrix", po.get_arg(3))}
    alis = {k: list(a) for k, a in
            SequentialTableReader("int-vector", po.get_arg(4))}
    lats = {k: l for k, l in
            SequentialTableReader(LatticeHolder(), po.get_arg(5))}
    keys = sorted(set(feats) & set(alis) & set(lats))
    if not keys:
        warn("no utterances with feats+ali+lattice")
        return 1
    params, objfs = train_discriminative(
        apply_fn, variables["params"], tm,
        {k: feats[k] for k in keys}, {k: alis[k] for k in keys},
        {k: lats[k] for k in keys}, tm.num_pdfs,
        DiscTrainOptions(num_epochs=num_epochs[0],
                         learning_rate=learning_rate[0],
                         acoustic_scale=acoustic_scale[0],
                         criterion=criterion[0]))
    new_vars = dict(variables)
    new_vars["params"] = params
    save_checkpoint(po.get_arg(6), new_vars, 0, extra=meta)
    log(f"discriminative training ({criterion[0]}): objf "
        f"{objfs[0]:.4f} -> {objfs[-1]:.4f} over {len(keys)} utts")
    return 0


def wav_perturb_speed(argv: List[str]) -> int:
    po = ParseOptions(
        "Speed-perturb waveforms by a factor (the 3-way 0.9/1.0/1.1 "
        "augmentation of utils/perturb_data_dir_speed.sh, done by "
        "resampling like sox speed: the output keeps the input "
        "sample rate but is 1/factor as long, shifting pitch and "
        "tempo together).\n"
        "Usage: wav-perturb-speed [options] <factor> <wav-rspecifier> "
        "<wav-wspecifier>")
    prefix = po.register_value(
        "utt-prefix", "", "Prefix for output utterance ids "
        "(e.g. 'sp0.9-'; empty keeps the key)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.resample import LinearResample
    from kaldi_tpu.feat.wave import WaveData
    factor = float(po.get_arg(1))
    if factor <= 0:
        print("wav-perturb-speed: factor must be positive", flush=True)
        return 1
    writer = TableWriter("wave", po.get_arg(3))
    resamplers = {}
    n = 0
    for key, wav in SequentialTableReader("wave", po.get_arg(2)):
        fs = wav.samp_freq
        # sox speed F == play the samples at rate fs*F, i.e. resample
        # from fs*F to fs (integer rates for the gcd-phase resampler)
        rin = int(round(fs * factor))
        if rin not in resamplers:
            resamplers[rin] = LinearResample(rin, int(fs))
        out = np.stack([resamplers[rin].resample(ch)
                        for ch in wav.data])
        writer.write(prefix[0] + key, WaveData(fs, out))
        n += 1
    writer.close()
    log(f"speed-perturbed {n} waveforms by {factor}")
    return 0 if n else 1


def wav_perturb_volume(argv: List[str]) -> int:
    po = ParseOptions(
        "Scale waveform amplitudes (utils/perturb_data_dir_volume.sh; "
        "a fixed --factor or a random factor per utterance in "
        "[--low, --high]).\n"
        "Usage: wav-perturb-volume [options] <wav-rspecifier> "
        "<wav-wspecifier>")
    factor = po.register_value("factor", 0.0,
                               "Fixed scale (0 = random per utt)")
    low = po.register_value("low", 0.125, "Random range low")
    high = po.register_value("high", 2.0, "Random range high")
    seed = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.wave import WaveData
    rng = np.random.default_rng(seed[0])
    writer = TableWriter("wave", po.get_arg(2))
    n = 0
    for key, wav in SequentialTableReader("wave", po.get_arg(1)):
        f = factor[0] or float(rng.uniform(low[0], high[0]))
        out = np.clip(wav.data * f, -32768.0, 32767.0)
        writer.write(key, WaveData(wav.samp_freq,
                                   out.astype(np.float32)))
        n += 1
    writer.close()
    log(f"volume-perturbed {n} waveforms")
    return 0 if n else 1


def compute_and_process_kaldi_pitch_feats(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute Kaldi pitch and post-process it into the standard "
        "(POV, normalized-log-pitch, delta) features in one tool "
        "(compute-and-process-kaldi-pitch-feats.cc).\n"
        "Usage: compute-and-process-kaldi-pitch-feats [options] "
        "<wav-rspecifier> <feats-wspecifier>")
    samp_freq = po.register_value("sample-frequency", 16000.0,
                                  "Waveform sampling frequency")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                      ProcessPitchOptions,
                                      compute_kaldi_pitch,
                                      process_pitch)
    popts = PitchExtractionOptions(samp_freq=samp_freq[0])
    oopts = ProcessPitchOptions()
    writer = TableWriter("matrix", po.get_arg(2))
    n = 0
    for key, wav in SequentialTableReader("wave", po.get_arg(1)):
        raw = compute_kaldi_pitch(
            np.asarray(wav.channel(0), np.float32), popts)
        writer.write(key, process_pitch(raw, oopts))
        n += 1
    writer.close()
    log(f"computed+processed pitch for {n} utterances")
    return 0 if n else 1
