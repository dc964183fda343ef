"""fMPE / twofeats / fgmm / misc tail (parity: src/gmmbin
gmm-fmpe-acc-stats.cc, fmpe-acc-stats.cc, fmpe-sum-accs.cc,
gmm-get-stats-deriv.cc (indirect-diff-diag-gmm.cc:25),
gmm-acc-stats-twofeats.cc, gmm-global-acc-stats-twofeats.cc,
gmm-global-est-lvtln-trans.cc; src/fgmmbin fgmm-global-merge.cc,
fgmm-global-init-from-accs.cc; src/fstbin fstrand.cc; src/bin
cuda-compiled.cc, cuda-gpu-available.cc, build-pfile-from-ali.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_fmpe_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate fMPE projection stats with a GMM model: the "
        "gradient of the soft-count frame objective wrt M, computed "
        "by autodiff through the decode-time loglike kernel "
        "(gmm-fmpe-acc-stats.cc; features are pre-fMPE).\n"
        "Usage: gmm-fmpe-acc-stats [options] <model-in> <fmpe-in> "
        "<feature-rspecifier> <gselect-rspecifier> "
        "<posteriors-rspecifier> <fmpe-stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.cli.tail8_tools import _read_fmpe
    from kaldi_tpu.hmm.posterior import posterior_to_pdf
    from kaldi_tpu.transform.fmpe import FmpeStats, fmpe_objective_grad
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        fmpe = _read_fmpe(f, b)
    # gselect is accepted for CLI parity; the descriptor GMM's own
    # posteriors are computed in full (they are cheap on this scale)
    _ = po.get_arg(4)
    post_reader = RandomAccessTableReader("posterior", po.get_arg(5))
    stats = FmpeStats(fmpe.M.shape)
    n = 0
    tot_obj = tot_frames = 0.0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            continue
        pdf_post = posterior_to_pdf(post_reader[key], tm)
        grad, obj = fmpe_objective_grad(fmpe, am,
                                        np.asarray(feats), pdf_post)
        stats.grad += grad
        stats.tot_frames += feats.shape[0]
        tot_obj += obj
        tot_frames += feats.shape[0]
        n += 1
    kaldi_io.write_kaldi_object(stats.write, po.get_arg(6), binary[0])
    log(f"accumulated fMPE stats from {n} utterances; objf/frame "
        f"{tot_obj / max(tot_frames, 1):.4f}")
    return 0 if n else 1


def fmpe_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate fMPE stats from per-frame feature derivatives "
        "(fmpe-acc-stats.cc): dObj/dM[c,g,:] += h[t,c,g] * deriv[t,:] "
        "with h the fMPE GMM's context-expanded posteriors.\n"
        "Usage: fmpe-acc-stats [options] <fmpe-in> "
        "<feature-rspecifier> <feat-deriv-rspecifier> "
        "<fmpe-stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail8_tools import _read_fmpe
    from kaldi_tpu.transform.fmpe import FmpeStats
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = iof.init_input_stream(f)
        fmpe = _read_fmpe(f, b)
    deriv_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    stats = FmpeStats(fmpe.M.shape)
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in deriv_reader:
            warn(f"no derivative for {key}")
            continue
        deriv = np.asarray(deriv_reader[key], np.float64)
        h = fmpe.descriptor(np.asarray(feats))       # (T, C, G)
        T = min(h.shape[0], deriv.shape[0])
        stats.grad += np.einsum("tcg,td->cgd", h[:T], deriv[:T],
                                optimize=True)
        stats.tot_frames += T
        n += 1
    kaldi_io.write_kaldi_object(stats.write, po.get_arg(4), binary[0])
    log(f"accumulated fMPE stats from {n} utterances")
    return 0 if n else 1


def fmpe_sum_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum fMPE stats (fmpe-sum-accs.cc).\n"
        "Usage: fmpe-sum-accs [options] <stats-out> <stats-in1> "
        "<stats-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.fmpe import FmpeStats
    total = None
    for i in range(2, po.num_args() + 1):
        a = kaldi_io.read_kaldi_object(FmpeStats.read, po.get_arg(i))
        if total is None:
            total = a
        else:
            total.add(a)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    log(f"summed {po.num_args() - 1} fMPE stats "
        f"({total.tot_frames:.0f} frames)")
    return 0


def gmm_get_stats_deriv(argv: List[str]) -> int:
    po = ParseOptions(
        "Derivative of the discriminative objective wrt ML stats, "
        "for fMPE/fMMI indirect differentials "
        "(gmm-get-stats-deriv.cc; indirect-diff-diag-gmm.cc:25 "
        "GetStatsDerivative).\n"
        "Usage: gmm-get-stats-deriv [options] <model-in> "
        "<num-stats-in> <den-stats-in> <ml-stats-in> <deriv-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    min_variance = po.register_value("min-variance", 0.001,
                                     "Variance floor")
    min_occ = po.register_value("min-gaussian-occupancy", 10.0,
                                "Minimum ML occupancy")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    num = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    den = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(3))
    ml = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(4))
    out = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
    skipped = 0
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        means = g.get_means().astype(np.float64)
        var = (1.0 / g.inv_vars).astype(np.float64)
        na, da, ma = num.accs[pdf], den.accs[pdf], ml.accs[pdf]
        oa = out.accs[pdf]
        for m in range(g.num_gauss):
            ml_count = float(ma.occupancy[m])
            if ml_count <= min_occ[0]:
                skipped += 1
                continue
            disc_count = float(na.occupancy[m]) - float(da.occupancy[m])
            disc_x = na.mean_accs[m] - da.mean_accs[m]
            disc_x2 = na.var_accs[m] - da.var_accs[m]
            mm, mv = means[m], var[m]
            inv_v = 1.0 / mv
            d_mean = inv_v * (disc_x - mm * disc_count)
            d_var = 0.5 * ((disc_x2 - 2 * mm * disc_x
                            + disc_count * mm * mm) * inv_v * inv_v
                           - disc_count * inv_v)
            s_mean = ma.mean_accs[m] / ml_count
            s_var = ma.var_accs[m] / ml_count - s_mean ** 2
            d_svar = np.where(mv <= min_variance[0] * 1.01, 0.0,
                              d_var * mv / np.maximum(s_var, 1e-20))
            oa.mean_accs[m] = (d_mean / ml_count
                               - 2 * d_svar * s_mean / ml_count)
            oa.var_accs[m] = d_svar / ml_count
    kaldi_io.write_kaldi_object(out.write, po.get_arg(5), binary[0])
    log(f"computed stats derivative ({skipped} low-count gaussians "
        "skipped)")
    return 0


def gmm_acc_stats_twofeats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate GMM stats with posteriors computed on one feature "
        "stream and statistics on another "
        "(gmm-acc-stats-twofeats.cc; fMPE/feature-transform "
        "training).\n"
        "Usage: gmm-acc-stats-twofeats [options] <model-in> "
        "<feature1-rspecifier> <feature2-rspecifier> "
        "<posteriors-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm, AccumDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    feat2_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(4))
    dim2 = None
    accs = None
    n = err = 0
    for key, feats1 in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in feat2_reader or key not in post_reader:
            warn(f"missing second features or posteriors for {key}")
            err += 1
            continue
        feats2 = np.asarray(feat2_reader[key], np.float64)
        if dim2 is None:
            dim2 = feats2.shape[1]
            accs = AccumAmDiagGmm(
                num_transition_ids=tm.num_transition_ids)
            accs.accs = [AccumDiagGmm(am.get_pdf(p).num_gauss, dim2)
                         for p in range(am.num_pdfs)]
        post = post_reader[key]
        feats1 = np.asarray(feats1, np.float64)
        T = min(feats1.shape[0], feats2.shape[0], len(post))
        for t in range(T):
            for tid, w in post[t]:
                if w == 0.0:
                    continue
                accs.transition_accs[int(tid)] += w
                pdf = tm.transition_id_to_pdf(int(tid))
                g = am.get_pdf(pdf)
                gp = g.component_posteriors(
                    feats1[t:t + 1].astype(np.float32)) * w
                accs.accs[pdf].accumulate(feats2[t:t + 1], gp)
        n += 1
    if accs is None:
        print("gmm-acc-stats-twofeats: no data", flush=True)
        return 1
    kaldi_io.write_kaldi_object(accs.write, po.get_arg(5), binary[0])
    log(f"accumulated twofeats stats from {n} utterances "
        f"({err} errors); second dim {dim2}")
    return 0 if n else 1


def gmm_global_acc_stats_twofeats(argv: List[str]) -> int:
    po = ParseOptions(
        "Global-GMM twofeats stats: posteriors from the first "
        "stream, moments from the second "
        "(gmm-global-acc-stats-twofeats.cc).\n"
        "Usage: gmm-global-acc-stats-twofeats [options] <model-in> "
        "<feature1-rspecifier> <feature2-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.mle import AccumDiagGmm
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    feat2_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    acc = None
    n = 0
    for key, feats1 in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in feat2_reader:
            warn(f"no second features for {key}")
            continue
        feats2 = np.asarray(feat2_reader[key], np.float64)
        if acc is None:
            acc = AccumDiagGmm(gmm.num_gauss, feats2.shape[1])
        post = gmm.component_posteriors(
            np.asarray(feats1, np.float32))
        T = min(post.shape[0], feats2.shape[0])
        acc.accumulate(feats2[:T], post[:T])
        n += 1
    if acc is None:
        print("gmm-global-acc-stats-twofeats: no data", flush=True)
        return 1
    kaldi_io.write_kaldi_object(acc.write, po.get_arg(4), binary[0])
    log(f"accumulated global twofeats stats from {n} utterances")
    return 0 if n else 1


def fgmm_global_merge(argv: List[str]) -> int:
    po = ParseOptions(
        "Concatenate full-covariance GMMs into one, weights "
        "proportional to each input's #Gauss; writes the sizes file "
        "(fgmm-global-merge.cc).\n"
        "Usage: fgmm-global-merge [options] <fgmm-out> "
        "<sizes-file-out> <fgmm-in1> <fgmm-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import FullGmm
    gmms = [kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(i))
            for i in range(3, po.num_args() + 1)]
    total = sum(g.num_gauss for g in gmms)
    weights, means, covars, sizes = [], [], [], []
    for g in gmms:
        scale = g.num_gauss / total
        weights.append(np.asarray(g.weights) * scale)
        means.append(g.get_means())
        covars.append(g.get_covars())
        sizes.append(g.num_gauss)
    out = FullGmm(total, gmms[0].dim)
    out.set_from_means_and_covars(np.concatenate(weights),
                                  np.concatenate(means),
                                  np.concatenate(covars))
    out.compute_gconsts()
    kaldi_io.write_kaldi_object(out.write, po.get_arg(1), binary[0])
    with open(po.get_arg(2), "w") as f:
        f.write(" ".join(str(s) for s in sizes) + "\n")
    log(f"merged {len(gmms)} full GMMs into {total} gaussians")
    return 0


def fgmm_global_init_from_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize a full-covariance GMM directly from accumulated "
        "stats (fgmm-global-init-from-accs.cc).\n"
        "Usage: fgmm-global-init-from-accs [options] <stats-in> "
        "<number-of-components> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    variance_floor = po.register_value(
        "variance-floor", 0.001, "Covariance eigenvalue floor")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import FullGmm
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        data = np.load(f)
        occ = np.asarray(data["occupancy"], np.float64)
        mean_accs = np.asarray(data["mean_accs"], np.float64)
        covar_accs = np.asarray(data["covar_accs"], np.float64)
    want = int(po.get_arg(2))
    if want != occ.shape[0]:
        print(f"fgmm-global-init-from-accs: stats have "
              f"{occ.shape[0]} components, requested {want}",
              flush=True)
        return 1
    keep = occ > 0
    occ_safe = np.maximum(occ, 1e-10)
    means = mean_accs / occ_safe[:, None]
    covars = covar_accs / occ_safe[:, None, None] \
        - np.einsum("md,me->mde", means, means)
    D = means.shape[1]
    for m in range(covars.shape[0]):
        w, v = np.linalg.eigh(covars[m])
        w = np.maximum(w, variance_floor[0])
        covars[m] = (v * w) @ v.T
    gmm = FullGmm(int(keep.sum()), D)
    gmm.set_from_means_and_covars(occ[keep] / occ[keep].sum(),
                                  means[keep], covars[keep])
    gmm.compute_gconsts()
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(3), binary[0])
    log(f"initialized full GMM with {gmm.num_gauss} components "
        "from stats")
    return 0


def gmm_global_est_lvtln_trans(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate per-speaker LVTLN transforms against a single "
        "global diagonal GMM (gmm-global-est-lvtln-trans.cc).\n"
        "Usage: gmm-global-est-lvtln-trans [options] <gmm-in> "
        "<lvtln-in> <feature-rspecifier> <trans-wspecifier> "
        "[<warp-wspecifier>]")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail8_tools import _read_lvtln, _spk_groups
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        lv = _read_lvtln(f, b)
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    writer = TableWriter("matrix", po.get_arg(4))
    warp_writer = (TableWriter("float", po.get_arg(5))
                   if po.num_args() == 5 else None)
    n = 0
    for spk, utts in _spk_groups(po, spk2utt[0], feats_reader.keys()):
        accs = FmllrDiagGmmAccs(gmm.dim)
        for u in utts:
            if u not in feats_reader:
                continue
            feats = np.asarray(feats_reader[u], np.float64)
            post = gmm.component_posteriors(feats.astype(np.float32))
            accs.accumulate_from_posteriors(gmm, feats, post)
        if accs.beta <= 0:
            continue
        W, warp, _impr = lv.compute_transform(accs)
        writer.write(spk, W)
        if warp_writer:
            warp_writer.write(spk, float(warp))
        n += 1
    writer.close()
    if warp_writer:
        warp_writer.close()
    log(f"global-GMM LVTLN transforms for {n} speakers")
    return 0 if n else 1


def fstrand(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate a small random FST for testing (fstrand.cc).\n"
        "Usage: fstrand [options] [<fst-out>]")
    seed = po.register_value("seed", 0, "Random seed (0 = from time)")
    num_states = po.register_value("num-states", 10,
                                   "Upper bound on states")
    num_labels = po.register_value("num-labels", 5,
                                   "Upper bound on labels")
    po.read(argv)
    if po.num_args() > 1:
        po.print_usage()
        return 1
    import time

    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    rng = np.random.default_rng(seed[0] or int(time.time()))
    fst = VectorFst(TropicalWeight)
    n = int(rng.integers(2, max(num_states[0], 3)))
    fst.add_states(n)
    fst.set_start(0)
    for s in range(n):
        for _ in range(int(rng.integers(0, 3))):
            fst.add_arc(s, Arc(int(rng.integers(0, num_labels[0])),
                               int(rng.integers(0, num_labels[0])),
                               float(rng.uniform(0, 2)),
                               int(rng.integers(0, n))))
        if rng.random() < 0.3 or s == n - 1:
            fst.set_final(s, float(rng.uniform(0, 1)))
    import sys as _sys
    if po.num_args() == 1 and po.get_arg(1) != "-":
        with open(po.get_arg(1), "wb") as f:
            write_fst(f, fst)
    else:
        write_fst(_sys.stdout.buffer, fst)
    return 0


def cuda_compiled(argv: List[str]) -> int:
    po = ParseOptions(
        "Exit 0 if this build has accelerator (TPU) support compiled "
        "in (parity surface for cuda-compiled.cc; this framework is "
        "always built with the XLA backend).\n"
        "Usage: cuda-compiled")
    po.read(argv)
    return 0


def cuda_gpu_available(argv: List[str]) -> int:
    po = ParseOptions(
        "Exit 0 if an accelerator device is currently available "
        "(parity surface for cuda-gpu-available.cc; checks for a "
        "non-CPU JAX backend).\n"
        "Usage: cuda-gpu-available")
    po.read(argv)
    try:
        import jax
        devs = jax.devices()
        kinds = {d.platform for d in devs}
        if kinds - {"cpu"}:
            log(f"accelerator available: {sorted(kinds - {'cpu'})} "
                f"({len(devs)} devices)")
            return 0
        log("no accelerator: CPU backend only")
        return 1
    except Exception as e:  # backend init failure == not available
        log(f"no accelerator: {e}")
        return 1


def build_pfile_from_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Write features+alignment labels in the (textual) pfile "
        "layout: `<sent> <frame> <feat...> <label>` rows "
        "(build-pfile-from-ali.cc; the reference pipes this into "
        "pfile_create).\n"
        "Usage: build-pfile-from-ali [options] <model-in> "
        "<ali-rspecifier> <features-rspecifier> <pfile-wxfilename>")
    every_nth = po.register_value("every-nth-frame", 1,
                                  "Keep one in this many frames")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    tm = _read_tm(po.get_arg(1))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    n = 0
    with kaldi_io.output_stream(po.get_arg(4)) as out:
        for sent, (key, feats) in enumerate(
                SequentialTableReader("matrix", po.get_arg(3))):
            if key not in ali_reader:
                continue
            pdfs = tm.transition_ids_to_pdfs(ali_reader[key])
            T = min(feats.shape[0], len(pdfs))
            for t in range(0, T, max(every_nth[0], 1)):
                row = " ".join(f"{v:.6g}" for v in feats[t])
                out.write(f"{sent} {t} {row} {int(pdfs[t])}\n"
                          .encode())
            n += 1
    log(f"wrote pfile rows for {n} utterances")
    return 0 if n else 1
