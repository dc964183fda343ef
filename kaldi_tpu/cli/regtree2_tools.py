"""Regression-tree adaptation CLI tail (parity: src/gmmbin
gmm-est-regtree-fmllr.cc, gmm-est-regtree-mllr.cc,
gmm-decode-faster-regtree-fmllr.cc, gmm-decode-faster-regtree-mllr.cc,
gmm-latgen-faster-regtree-fmllr.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _read_tree(path):
    from kaldi_tpu.cli.tail8_tools import _read_regtree
    with kaldi_io.input_stream(path) as f:
        return _read_regtree(f, iof.init_input_stream(f))


def _est_regtree(argv: List[str], mllr: bool) -> int:
    name = "gmm-est-regtree-mllr" if mllr else "gmm-est-regtree-fmllr"
    kind = "MLLR (mean)" if mllr else "fMLLR (feature)"
    po = ParseOptions(
        f"Compute regression-tree {kind} transforms per utterance or "
        f"per speaker from posteriors ({name}.cc).\n"
        f"Usage: {name} [options] <model-in> <feature-rspecifier> "
        "<posteriors-rspecifier> <regression-tree> "
        "<transforms-wspecifier>")
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    min_count = po.register_value(
        "min-count", 200.0 if mllr else 1000.0,
        "Minimum occupancy at a tree node to estimate its transform")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.cli.tail8_tools import _spk_groups
    from kaldi_tpu.transform.regtree_fmllr import (RegtreeFmllrAccs,
                                                   estimate_regtree_fmllr)
    from kaldi_tpu.transform.regtree_mllr import (RegtreeMllrAccs,
                                                  estimate_regtree_mllr)
    tm, am = read_am_gmm(po.get_arg(1))
    tree = _read_tree(po.get_arg(4))
    feat_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    from kaldi_tpu.transform.regtree_fmllr import RegtreeFmllr
    from kaldi_tpu.transform.regtree_mllr import RegtreeMllr
    writer = TableWriter(RegtreeMllr if mllr else RegtreeFmllr,
                         po.get_arg(5))
    n = 0
    for spk, utts in _spk_groups(po, spk2utt[0], feat_reader.keys()):
        accs = (RegtreeMllrAccs if mllr else RegtreeFmllrAccs)(
            tree, am.dim)
        got = False
        for u in utts:
            if u not in feat_reader or u not in post_reader:
                warn(f"missing features or posteriors for {u}")
                continue
            accs.accumulate_from_posterior(
                am, tm, np.asarray(feat_reader[u], np.float64),
                post_reader[u])
            got = True
        if not got:
            continue
        if mllr:
            xf = estimate_regtree_mllr(accs, min_count=min_count[0])
        else:
            xf, _impr = estimate_regtree_fmllr(accs,
                                               min_count=min_count[0])
        writer.write(spk, xf)
        n += 1
    writer.close()
    log(f"{name}: wrote {n} transform sets")
    return 0 if n else 1


def gmm_est_regtree_fmllr(argv: List[str]) -> int:
    return _est_regtree(argv, mllr=False)


def gmm_est_regtree_mllr(argv: List[str]) -> int:
    return _est_regtree(argv, mllr=True)


def _decode_regtree(argv: List[str], mllr: bool,
                    latgen: bool = False) -> int:
    if latgen:
        name = "gmm-latgen-faster-regtree-fmllr"
    else:
        name = ("gmm-decode-faster-regtree-mllr" if mllr
                else "gmm-decode-faster-regtree-fmllr")
    out_desc = "<lattice-wspecifier>" if latgen \
        else "<words-wspecifier> [<alignments-wspecifier>]"
    po = ParseOptions(
        f"Decode features with per-speaker regression-tree "
        f"{'MLLR' if mllr else 'fMLLR'} transforms ({name}.cc).\n"
        f"Usage: {name} [options] <model-in> <fst-in> <regtree-in> "
        f"<features-rspecifier> <transforms-rspecifier> {out_desc}")
    if latgen:
        from kaldi_tpu.decoder.lattice_decoder import \
            LatticeFasterDecoderOptions
        dopts = LatticeFasterDecoderOptions()
    else:
        from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
        dopts = FasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map "
        "(transforms keyed by speaker)")
    po.read(argv)
    if po.num_args() < 6 or po.num_args() > 7:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.transform.regtree_fmllr import (RegtreeFmllr,
                                                   regtree_log_likes)
    from kaldi_tpu.transform.regtree_mllr import (RegtreeMllr,
                                                  regtree_mllr_log_likes)
    tm, am = read_am_gmm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    tree = _read_tree(po.get_arg(3))
    xf_reader = RandomAccessTableReader(
        RegtreeMllr if mllr else RegtreeFmllr, po.get_arg(5))
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    if latgen:
        from kaldi_tpu.decoder.lattice_decoder import \
            LatticeFasterDecoder
        from kaldi_tpu.lat.functions import determinize_lattice
        from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
        dec = LatticeFasterDecoder(hclg, dopts)
        lat_writer = TableWriter(LatticeHolder(), po.get_arg(6))
        word_writer = ali_writer = None
    else:
        from kaldi_tpu.decoder.viterbi import FasterDecoder
        dec = FasterDecoder(hclg, dopts)
        word_writer = TableWriter("int-vector", po.get_arg(6))
        ali_writer = (TableWriter("int-vector", po.get_arg(7))
                      if po.num_args() >= 7 else None)
        lat_writer = None
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(4)):
        xf_key = key
        if utt2spk is not None:
            if key not in utt2spk:
                warn(f"no speaker map entry for {key}")
                err += 1
                continue
            xf_key = utt2spk[key][0]
        if xf_key not in xf_reader:
            warn(f"no transforms for {xf_key}")
            err += 1
            continue
        xf = xf_reader[xf_key]
        if mllr:
            ll = regtree_mllr_log_likes(am, tree, xf,
                                        np.asarray(feats))
        else:
            ll = regtree_log_likes(am, tree, xf, np.asarray(feats))
        if latgen:
            lat = dec.decode(ll, tm.id2pdf_id, acoustic_scale[0])
            if lat is None:
                err += 1
                continue
            out = determinize_lattice(lat) \
                if dopts.determinize_lattice else lat
            lat_writer.write(key, out)
        else:
            res = dec.decode(ll, tm.id2pdf_id,
                             acoustic_scale=acoustic_scale[0])
            if res is None:
                warn(f"decode failed for {key}")
                err += 1
                continue
            ali, words, _cost = res
            word_writer.write(key, words)
            if ali_writer:
                ali_writer.write(key, ali)
        n += 1
    for w in (lat_writer, word_writer, ali_writer):
        if w is not None:
            w.close()
    log(f"{name}: decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def gmm_decode_faster_regtree_fmllr(argv: List[str]) -> int:
    return _decode_regtree(argv, mllr=False)


def gmm_decode_faster_regtree_mllr(argv: List[str]) -> int:
    return _decode_regtree(argv, mllr=True)


def gmm_latgen_faster_regtree_fmllr(argv: List[str]) -> int:
    return _decode_regtree(argv, mllr=False, latgen=True)
