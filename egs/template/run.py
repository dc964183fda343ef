#!/usr/bin/env python
"""Generic corpus recipe over standard Kaldi data directories
(parity: the egs/*/s5 stage structure — mini_librispeech-shaped, with
GMM stages mirroring run.sh):

  stage 0: validate data dirs, prepare lang from the lexicon
  stage 1: MFCC features
  stage 2: monophone training (flat start + EM, via the CLIs)
  stage 3: triphone training (delta features, tree building)
  stage 4: graph build (G compiled from an ARPA LM)
  stage 5: decode + score (lattice rescoring sweep)
  stage 6: tri2 = LDA+MLLT training on tri1 alignments + decode
  stage 7: tri3 = SAT (per-speaker fMLLR) + two-pass adapted decode
  stage 8: chain = flat-start e2e LF-MMI TDNN-F + decode
           (enabled with --chain-epochs N)

Point it at any directories in the standard layout (wav.scp, text,
utt2spk; lexicon.txt 'WORD p1 p2 ...'; ARPA-format LM):

  python egs/template/run.py --train data/train --test data/test \
      --lexicon data/local/lexicon.txt --arpa data/local/lm.arpa \
      --dir exp
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from kaldi_tpu.cli import get_tool  # noqa: E402
from kaldi_tpu.util.table import (SequentialTableReader,  # noqa: E402
                                  TableWriter)


def sh(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    if rc != 0:
        raise SystemExit(f"{tool} failed with status {rc}")


def read_texts(data_dir):
    out = {}
    with open(os.path.join(data_dir, "text")) as f:
        for line in f:
            parts = line.split()
            out[parts[0]] = parts[1:]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True)
    ap.add_argument("--test", required=True)
    ap.add_argument("--lexicon", required=True)
    ap.add_argument("--arpa", required=True)
    ap.add_argument("--dir", default="exp")
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--sample-frequency", type=float, default=8000.0)
    ap.add_argument("--num-leaves", type=int, default=100)
    ap.add_argument("--tot-gauss", type=int, default=200)
    ap.add_argument("--chain-epochs", type=int, default=0,
                    help="run stage 8 (flat-start e2e chain) with "
                    "this many epochs (0 = skip)")
    args = ap.parse_args(argv)
    d = args.dir
    os.makedirs(d, exist_ok=True)
    lang = os.path.join(d, "lang")
    mono = os.path.join(d, "mono")
    tri1 = os.path.join(d, "tri1")

    if args.stage <= 0:
        print("=== stage 0: validate + prepare_lang ===")
        sh("validate-data-dir", args.train)
        sh("validate-data-dir", args.test)
        sh("prepare-lang", args.lexicon, lang)
        sh("validate-lang", lang)

    if args.stage <= 1:
        print("=== stage 1: features ===")
        for sd in (args.train, args.test):
            sh("compute-mfcc-feats",
               f"--sample-frequency={args.sample_frequency}", "--dither=0",
               f"scp:{sd}/wav.scp", f"ark,scp:{sd}/feats.ark,{sd}/feats.scp")
            sh("compute-cmvn-stats", f"ark:{sd}/feats.ark",
               f"ark:{sd}/cmvn.ark")

    if args.stage <= 2:
        print("=== stage 2: mono ===")
        os.makedirs(mono, exist_ok=True)
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        with TableWriter("int-vector", f"ark:{args.train}/text.int") as w:
            for utt, toks in read_texts(args.train).items():
                w.write(utt, [words[t] for t in toks])
        dim = 13
        sh("gmm-init-mono", f"--train-feats=ark:{args.train}/feats.ark",
           f"{lang}/topo", dim, f"{mono}/0.mdl", f"{mono}/tree")
        sh("compile-train-graphs", "--self-loop-scale=0.1",
           f"{mono}/tree", f"{mono}/0.mdl", f"{lang}/L_disambig.fst",
           f"ark:{args.train}/text.int", f"ark:{mono}/graphs.ark")
        sh("align-equal-compiled", f"ark:{mono}/graphs.ark",
           f"ark:{args.train}/feats.ark", f"ark:{mono}/ali.ark")
        sh("gmm-acc-stats-ali", f"{mono}/0.mdl",
           f"ark:{args.train}/feats.ark", f"ark:{mono}/ali.ark",
           f"{mono}/0.acc")
        sh("gmm-est", "--min-gaussian-occupancy=3",
           f"--mix-up={args.tot_gauss // 4}",
           f"{mono}/0.mdl", f"{mono}/0.acc", f"{mono}/1.mdl")
        mdl = "1.mdl"
        for it in range(1, 7):
            sh("gmm-align-compiled", "--beam=10", "--acoustic-scale=0.1",
               f"{mono}/{mdl}", f"ark:{mono}/graphs.ark",
               f"ark:{args.train}/feats.ark", f"ark:{mono}/ali.ark")
            sh("gmm-acc-stats-ali", f"{mono}/{mdl}",
               f"ark:{args.train}/feats.ark", f"ark:{mono}/ali.ark",
               f"{mono}/{it}.acc")
            sh("gmm-est", "--min-gaussian-occupancy=3",
               f"--mix-up={args.tot_gauss // 2}",
               f"{mono}/{mdl}", f"{mono}/{it}.acc", f"{mono}/{it + 1}.mdl")
            mdl = f"{it + 1}.mdl"
        os.replace(os.path.join(mono, mdl), os.path.join(mono, "final.mdl"))
        sh("gmm-info", f"{mono}/final.mdl")

    if args.stage <= 3:
        print("=== stage 3: tri1 (deltas) ===")
        os.makedirs(tri1, exist_ok=True)
        # the reference drives this from steps/train_deltas.sh; here the
        # equivalent python driver (recipes/deltas.py) over the same
        # artifacts
        from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
        from kaldi_tpu.decoder.graph import Lang as LangObj
        from kaldi_tpu.decoder.lang_dir import read_lang_dir
        from kaldi_tpu.recipes.deltas import TrainDeltasOptions, train_deltas
        from kaldi_tpu.recipes.mono import MonoSystem, _align_all
        from kaldi_tpu.decoder.graph import TrainingGraphCompiler
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io as kio
        lexicon = {}
        with open(args.lexicon) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon.setdefault(parts[0], []).append(parts[1:])
        lang_obj = LangObj(lexicon, sil_phone="SIL", sil_prob=0.5)
        tm, am = read_am_gmm(f"{mono}/final.mdl")
        lang_obj.topo = tm.topo
        tree = kio.read_kaldi_object(ContextDependency.read, f"{mono}/tree")
        mono_sys = MonoSystem(lang_obj, tree, tm, am)
        feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.train}/feats.ark"))
        texts = read_texts(args.train)
        compiler = TrainingGraphCompiler(tm, tree, lang_obj)
        graphs = {u: compiler.compile(texts[u]) for u in feats}
        ali = _align_all(mono_sys, graphs, feats, 10.0, 0.1, 1.0)
        tri_sys = train_deltas(
            lang_obj, feats, texts, mono_sys, ali,
            TrainDeltasOptions(num_leaves=args.num_leaves,
                               totgauss=args.tot_gauss))
        write_am_gmm(f"{tri1}/final.mdl", tri_sys.tm, tri_sys.am)
        kio.write_kaldi_object(tri_sys.tree.write, f"{tri1}/tree")

    if args.stage <= 4:
        print("=== stage 4: graph (ARPA G) ===")
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        from kaldi_tpu.fstext.openfst_io import write_fst
        from kaldi_tpu.lm.arpa import arpa_to_fst, parse_arpa
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        with open(args.arpa) as f:
            lm = parse_arpa(f.read())
        g = arpa_to_fst(lm, words)
        with open(os.path.join(lang, "G.fst"), "wb") as f:
            write_fst(f, g)
        from kaldi_tpu.cli.gmm_tools import read_am_gmm
        from kaldi_tpu.decoder.graph import Lang as LangObj, \
            make_decoding_graph
        from kaldi_tpu.fstext.openfst_io import read_fst_file
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io as kio
        lexicon = {}
        with open(args.lexicon) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon.setdefault(parts[0], []).append(parts[1:])
        lang_obj = LangObj(lexicon, sil_phone="SIL", sil_prob=0.5)
        tm, am = read_am_gmm(f"{tri1}/final.mdl")
        lang_obj.topo = tm.topo
        tree = kio.read_kaldi_object(ContextDependency.read, f"{tri1}/tree")
        gfst = read_fst_file(os.path.join(lang, "G.fst"))
        hclg = make_decoding_graph(lang_obj, gfst, tree, tm)
        with open(os.path.join(tri1, "HCLG.fst"), "wb") as f:
            write_fst(f, hclg)

    if args.stage <= 5:
        print("=== stage 5: decode + score ===")
        sh("gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
           "--lattice-beam=6",
           f"{tri1}/final.mdl", f"{tri1}/HCLG.fst",
           f"ark:{args.test}/feats.ark", f"ark:{tri1}/lat.ark")
        from kaldi_tpu.decoder.lang_dir import read_symbol_table
        from kaldi_tpu.lat.functions import (add_word_ins_penalty,
                                             lattice_best_path,
                                             lattice_scale)
        from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
        from kaldi_tpu.util.edit_distance import WerStats
        words = read_symbol_table(os.path.join(lang, "words.txt"))
        names = {i: w for w, i in words.items()}
        refs = read_texts(args.test)
        lats = dict(SequentialTableReader(LatticeHolder,
                                          f"ark:{tri1}/lat.ark"))
        best = None
        best_hyps = None
        for lm_scale in (0.5, 1.0, 1.5, 2.0):
            for wip in (0.0, 0.5, 1.0):
                stats = WerStats()
                hyps = {}
                for utt, lat in lats.items():
                    scaled = add_word_ins_penalty(
                        lattice_scale(lat, lm_scale=lm_scale), wip)
                    _, wids, _ = lattice_best_path(scaled)
                    hyps[utt] = [names[i] for i in wids]
                    stats.add(refs[utt], hyps[utt])
                if best is None or stats.wer < best[0].wer:
                    best = (stats, lm_scale, wip)
                    best_hyps = hyps
        stats, lm_scale, wip = best
        print(f"best scoring: lm-scale {lm_scale} penalty {wip}")
        with TableWriter("token-vector", f"ark:{tri1}/hyp.txt") as w:
            for utt, toks in best_hyps.items():
                w.write(utt, toks)
        sh("compute-wer", "--mode=present", f"ark:{args.test}/text",
           f"ark:{tri1}/hyp.txt")
        if args.stage > 5:
            return stats.wer

    if args.stage <= 6:
        print("=== stage 6: tri2 (LDA+MLLT) ===")
        tri2 = os.path.join(d, "tri2")
        os.makedirs(tri2, exist_ok=True)
        from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
        from kaldi_tpu.decoder.graph import Lang as LangObj, \
            TrainingGraphCompiler
        from kaldi_tpu.feat.functions import splice_frames
        from kaldi_tpu.recipes.lda_mllt import (TrainLdaMlltOptions,
                                                train_lda_mllt)
        from kaldi_tpu.recipes.mono import (MonoSystem, _align_all, decode,
                                            make_hclg)
        from kaldi_tpu.transform.fmllr import apply_affine_transform
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io as kio
        from kaldi_tpu.util.edit_distance import WerStats
        from kaldi_tpu.base import io_funcs as iof
        lexicon = {}
        with open(args.lexicon) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon.setdefault(parts[0], []).append(parts[1:])
        lang_obj = LangObj(lexicon, sil_phone="SIL", sil_prob=0.5)
        tm, am = read_am_gmm(f"{tri1}/final.mdl")
        lang_obj.topo = tm.topo
        tree = kio.read_kaldi_object(ContextDependency.read,
                                     f"{tri1}/tree")
        tri1_sys = MonoSystem(lang_obj, tree, tm, am)
        feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.train}/feats.ark"))
        texts = read_texts(args.train)
        compiler = TrainingGraphCompiler(tm, tree, lang_obj)
        graphs = {u: compiler.compile(texts[u]) for u in feats}
        ali = _align_all(tri1_sys, graphs, feats, 10.0, 0.1, 1.0)
        opts = TrainLdaMlltOptions(
            num_iters=6, totgauss=args.tot_gauss,
            num_leaves=args.num_leaves, realign_iters=(2, 4),
            tree_min_gain=20.0, lda_dim=min(20, 13 * 5),
            splice_left=2, splice_right=2, mllt_iters=(1, 2))
        sys2, transform, _tf = train_lda_mllt(lang_obj, feats, texts,
                                              tri1_sys, ali, opts)
        write_am_gmm(f"{tri2}/final.mdl", sys2.tm, sys2.am)
        kio.write_kaldi_object(sys2.tree.write, f"{tri2}/tree")
        kio.write_kaldi_object(
            lambda st, b: iof.write_matrix(st, b, transform),
            f"{tri2}/final.mat")
        test_feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.test}/feats.ark"))
        sf_t = {u: apply_affine_transform(splice_frames(f, 2, 2),
                                          transform)
                for u, f in test_feats.items()}
        hclg2 = make_hclg(sys2, _read_g(d, args))
        hyps = decode(sys2, hclg2, sf_t, acoustic_scale=0.1)
        refs = read_texts(args.test)
        stats = WerStats()
        for utt, ref in refs.items():
            stats.add(ref, hyps[utt])
        print(f"tri2 (LDA+MLLT): {stats.report()}")
        with TableWriter("token-vector", f"ark:{tri2}/hyp.txt") as w:
            for utt, toks in hyps.items():
                w.write(utt, toks)
        sh("compute-wer", "--mode=present", f"ark:{args.test}/text",
           f"ark:{tri2}/hyp.txt")
        if args.stage > 6:
            return stats.wer

    if args.stage <= 7:
        print("=== stage 7: tri3 (SAT) + fMLLR two-pass decode ===")
        tri1 = os.path.join(d, "tri1")
        tri3 = os.path.join(d, "tri3")
        os.makedirs(tri3, exist_ok=True)
        from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
        from kaldi_tpu.decoder.graph import Lang as LangObj, \
            TrainingGraphCompiler
        from kaldi_tpu.recipes.lda_mllt import TrainSatOptions, train_sat
        from kaldi_tpu.recipes.mono import (MonoSystem, _align_all, decode,
                                            make_hclg)
        from kaldi_tpu.transform.fmllr import (FmllrDiagGmmAccs,
                                               apply_affine_transform)
        from kaldi_tpu.tree import ContextDependency
        from kaldi_tpu.util import kaldi_io as kio
        from kaldi_tpu.util.edit_distance import WerStats
        lexicon = {}
        with open(args.lexicon) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon.setdefault(parts[0], []).append(parts[1:])
        lang_obj = LangObj(lexicon, sil_phone="SIL", sil_prob=0.5)
        tm, am = read_am_gmm(f"{tri1}/final.mdl")
        lang_obj.topo = tm.topo
        tree = kio.read_kaldi_object(ContextDependency.read,
                                     f"{tri1}/tree")
        tri1_sys = MonoSystem(lang_obj, tree, tm, am)
        feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.train}/feats.ark"))
        texts = read_texts(args.train)
        utt2spk = {}
        with open(os.path.join(args.train, "utt2spk")) as f:
            for line in f:
                u, spk = line.split()
                utt2spk[u] = spk
        compiler = TrainingGraphCompiler(tm, tree, lang_obj)
        graphs = {u: compiler.compile(texts[u]) for u in feats}
        ali = _align_all(tri1_sys, graphs, feats, 10.0, 0.1, 1.0)
        sys3, spk_transforms = train_sat(
            lang_obj, feats, texts, utt2spk, tri1_sys, ali,
            TrainSatOptions(num_iters=5, totgauss=args.tot_gauss,
                            num_leaves=args.num_leaves,
                            realign_iters=(2, 4), tree_min_gain=20.0,
                            fmllr_iters=(1, 3), fmllr_min_count=50.0))
        write_am_gmm(f"{tri3}/final.mdl", sys3.tm, sys3.am)
        kio.write_kaldi_object(sys3.tree.write, f"{tri3}/tree")
        # two-pass adapted decode (steps/decode_fmllr.sh): first pass
        # unadapted, estimate per-test-speaker fMLLR from the first
        # pass alignment, re-decode on transformed features
        hclg3 = make_hclg(sys3, _read_g(d, args))
        test_feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.test}/feats.ark"))
        test_u2s = {}
        with open(os.path.join(args.test, "utt2spk")) as f:
            for line in f:
                u, spk = line.split()
                test_u2s[u] = spk
        from kaldi_tpu.decoder.viterbi import (FasterDecoder,
                                               FasterDecoderOptions)
        dec = FasterDecoder(hclg3, FasterDecoderOptions(beam=16.0))
        first_ali = {}
        for u, f in test_feats.items():
            ll = sys3.am.log_likes_batch(f)
            res = dec.decode(np.asarray(ll), sys3.tm.id2pdf_id, 0.1)
            if res is not None:
                first_ali[u] = res[0]
        by_spk = {}
        dim = next(iter(test_feats.values())).shape[1]
        for u, a in first_ali.items():
            accs = by_spk.setdefault(test_u2s.get(u, u),
                                     FmllrDiagGmmAccs(dim))
            T = min(test_feats[u].shape[0], len(a))
            accs.accumulate_from_alignment(sys3.am, sys3.tm,
                                           test_feats[u][:T], a[:T])
        test_W = {spk: accs.update(min_count=50.0)[0]
                  for spk, accs in by_spk.items()}
        ident = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
        adapted = {u: apply_affine_transform(
            f, test_W.get(test_u2s.get(u, u), ident))
            for u, f in test_feats.items()}
        hyps = decode(sys3, hclg3, adapted, acoustic_scale=0.1)
        refs = read_texts(args.test)
        stats = WerStats()
        for utt, ref in refs.items():
            stats.add(ref, hyps[utt])
        print(f"tri3 (SAT, fMLLR 2-pass): {stats.report()}")
        with TableWriter("token-vector", f"ark:{tri3}/hyp.txt") as w:
            for utt, toks in hyps.items():
                w.write(utt, toks)
        sh("compute-wer", "--mode=present", f"ark:{args.test}/text",
           f"ark:{tri3}/hyp.txt")
        if args.stage > 7 or args.chain_epochs <= 0:
            return stats.wer

    if args.stage <= 8:
        print("=== stage 8: chain (flat-start e2e LF-MMI) ===")
        chain_d = os.path.join(d, "chain")
        os.makedirs(chain_d, exist_ok=True)
        from kaldi_tpu.decoder.graph import (Lang as LangObj,
                                             make_decoding_graph)
        from kaldi_tpu.decoder.viterbi import (FasterDecoder,
                                               FasterDecoderOptions)
        from kaldi_tpu.recipes.chain import (ChainTrainOptions,
                                             nnet_log_likes,
                                             train_chain_e2e)
        from kaldi_tpu.util.edit_distance import WerStats
        lexicon = {}
        with open(args.lexicon) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon.setdefault(parts[0], []).append(parts[1:])
        lang_obj = LangObj(lexicon, sil_phone="SIL", sil_prob=0.5)
        lang_obj.make_topology()
        feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.train}/feats.ark"))
        texts = read_texts(args.train)
        model, variables, den, chain_tm, chain_tree = train_chain_e2e(
            lang_obj, feats, texts,
            opts=ChainTrainOptions(num_epochs=args.chain_epochs,
                                   learning_rate=2e-3,
                                   minibatch_size=4))
        lang_obj.topo = chain_tm.topo
        hclg = make_decoding_graph(lang_obj, _read_g(d, args),
                                   chain_tree, chain_tm,
                                   transition_scale=1.0,
                                   self_loop_scale=1.0)
        test_feats = dict(SequentialTableReader(
            "matrix", f"ark:{args.test}/feats.ark"))
        scores = nnet_log_likes(model, variables, test_feats)
        dec = FasterDecoder(hclg, FasterDecoderOptions(beam=24.0))
        refs = read_texts(args.test)
        best = None
        for ac in (0.5, 1.0):
            stats = WerStats()
            for utt, ref in refs.items():
                res = dec.decode(scores[utt], chain_tm.id2pdf_id,
                                 acoustic_scale=ac)
                hyp = [] if res is None else \
                    [lang_obj.word_names[w] for w in res[1]]
                stats.add(ref, hyp)
            if best is None or stats.wer < best.wer:
                best = stats
        print(f"chain (e2e flat-start): {best.report()}")
        return best.wer


def _read_g(d, args):
    from kaldi_tpu.decoder.lang_dir import read_symbol_table
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    import os as _os
    return read_fst_file(_os.path.join(d, "lang", "G.fst"))


if __name__ == "__main__":
    main()
