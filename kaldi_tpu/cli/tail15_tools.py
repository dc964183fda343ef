"""Round-4 CLI tail: GrammarFst tooling, batched nnet3 compute, and
the cudafeat/cudadecoder binary surface mapped onto the batched device
pipelines.  The reference's *-cuda names are kept verbatim so recipes
that invoke them run unchanged; on this framework "cuda" means "the
accelerator batch path", i.e. the TPU device programs
(SURVEY.md §2.3/§2.5: cudafeatbin, cudadecoderbin)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

GRAMMAR_MAGIC = "<KtGrammarFst>"


# ======================================================================
# GrammarFst tooling (fstbin/make-grammar-fst.cc, grammar-fst.h:101)
# ======================================================================

def _write_grammar(wxfilename: str, offset: int, top, ifsts) -> None:
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.fstext.openfst_io import write_fst
    with kaldi_io.output_stream(wxfilename) as f:
        iof.init_output_stream(f, True)
        iof.write_token(f, True, GRAMMAR_MAGIC)
        iof.write_int32(f, True, offset)
        iof.write_int32(f, True, len(ifsts))
        for nt, fst in ifsts:
            iof.write_int32(f, True, nt)
            write_fst(f, fst)
        write_fst(f, top)


def read_grammar_any(rxfilename: str):
    """-> (GrammarFst | VectorFst): reads either our grammar container
    or a plain FST file."""
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.fstext.grammar_fst import GrammarFst
    from kaldi_tpu.fstext.openfst_io import read_fst, read_fst_file
    with kaldi_io.input_stream(rxfilename) as f:
        head = iof.peek_bytes(f, 2 + len(GRAMMAR_MAGIC))
        if GRAMMAR_MAGIC.encode() not in head:
            pass
        else:
            iof.init_input_stream(f)
            iof.expect_token(f, True, GRAMMAR_MAGIC)
            offset = iof.read_int32(f, True)
            n = iof.read_int32(f, True)
            ifsts = []
            for _ in range(n):
                nt = iof.read_int32(f, True)
                ifsts.append((nt, read_fst(f)))
            top = read_fst(f)
            return GrammarFst(offset, top, ifsts)
    return read_fst_file(rxfilename)


def expand_grammar(g):
    """GrammarFst -> statically expanded VectorFst by walking the
    grammar's own lazy splice surface (BFS over its duck-typed
    arcs/finals views) — exact by construction, eager instead of the
    reference's decode-time expansion (grammar-fst.h:101)."""
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.grammar_fst import GrammarFst
    if not isinstance(g, GrammarFst):
        return g
    out = VectorFst(TropicalWeight)
    ids = {g.start: out.add_state()}
    out.set_start(ids[g.start])
    stack = [g.start]
    while stack:
        s = stack.pop()
        fin = g.finals[s]
        if fin is not None and fin != TropicalWeight.zero:
            out.set_final(ids[s], fin)
        for a in g.arcs[s]:
            if a.nextstate not in ids:
                ids[a.nextstate] = out.add_state()
                stack.append(a.nextstate)
            out.add_arc(ids[s], Arc(a.ilabel, a.olabel, a.weight,
                                    ids[a.nextstate]))
    return out


def make_grammar_fst(argv: List[str]) -> int:
    po = ParseOptions(
        "Make a grammar FST for decoding with dynamically spliced "
        "sub-graphs (fstbin/make-grammar-fst.cc).\n"
        "Usage (1): make-grammar-fst [options] <top-level-fst> "
        "<symbol1> <fst1> [<symbol2> <fst2> ...] <fst-out>\n"
        "Usage (2): make-grammar-fst <fst-in> <fst-out>  "
        "(prepare a single FST for grammar use)")
    offset = po.register_value(
        "nonterm-phones-offset", -1,
        "Integer id of the symbol #nonterm_bos in phones.txt")
    write_as_grammar = po.register_value(
        "write-as-grammar", True,
        "If true, write as a grammar container (lazy splicing at "
        "decode time); if false, expand statically and write a "
        "normal FST")
    po.read(argv)
    from kaldi_tpu.fstext.grammar_fst import (GrammarFst,
                                              prepare_for_grammar_fst)
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    if po.num_args() == 2:
        fst = read_fst_file(po.get_arg(1))
        prepare_for_grammar_fst(fst, offset[0])
        from kaldi_tpu.fstext.openfst_io import write_fst
        with kaldi_io.output_stream(po.get_arg(2)) as f:
            write_fst(f, fst)
        log("prepared 1 FST for grammar decoding")
        return 0
    if po.num_args() < 4 or po.num_args() % 2 != 0:
        po.print_usage()
        return 1
    top = read_fst_file(po.get_arg(1))
    ifsts = []
    for i in range(2, po.num_args() - 1, 2):
        nt = int(po.get_arg(i))
        ifsts.append((nt, read_fst_file(po.get_arg(i + 1))))
    if write_as_grammar[0]:
        _write_grammar(po.get_arg(po.num_args()), offset[0], top,
                       ifsts)
    else:
        g = GrammarFst(offset[0], top, ifsts)
        out = expand_grammar(g)
        from kaldi_tpu.fstext.openfst_io import write_fst
        with kaldi_io.output_stream(po.get_arg(po.num_args())) as f:
            write_fst(f, out)
    log(f"made grammar FST with {len(ifsts)} sub-FSTs")
    return 0


def nnet3_latgen_grammar(argv: List[str]) -> int:
    """nnet3bin/nnet3-latgen-grammar.cc: decode with a GrammarFst.
    The grammar is expanded statically (ops.replace_fst) — same
    search space, eager instead of decode-time splicing."""
    # delegate to nnet3-latgen-faster after static grammar expansion
    import tempfile
    from kaldi_tpu.cli.nnet3_tools import nnet3_latgen_faster
    from kaldi_tpu.fstext.openfst_io import write_fst
    po2 = list(argv)
    pos = [a for a in po2[1:] if not a.startswith("--")]
    if len(pos) < 5:
        warn("Usage: nnet3-latgen-grammar [options] <trans-model> "
             "<nnet-dir> <grammar-fst> <features-rspecifier> "
             "<lattice-wspecifier> [<words-wspecifier>]")
        return 1
    g = read_grammar_any(pos[2])
    fst = expand_grammar(g)
    with tempfile.NamedTemporaryFile(suffix=".fst",
                                     delete=False) as tf:
        write_fst(tf, fst)
        tmp = tf.name
    argv2 = ["nnet3-latgen-faster"] + \
        [tmp if a == pos[2] else a for a in po2[1:]]
    return nnet3_latgen_faster(argv2)


def online2_wav_nnet3_latgen_grammar(argv: List[str]) -> int:
    """online2bin/online2-wav-nnet3-latgen-grammar.cc — the online
    wrapper over a grammar graph (expanded statically, see
    nnet3-latgen-grammar)."""
    import tempfile
    from kaldi_tpu.cli.online_tools import \
        online2_wav_nnet3_latgen_faster
    from kaldi_tpu.fstext.openfst_io import write_fst
    pos = [a for a in argv[1:] if not a.startswith("--")]
    if len(pos) < 4:
        warn("Usage: online2-wav-nnet3-latgen-grammar [options] "
             "<nnet3-in> <grammar-fst> <wav-rspecifier> "
             "<word-wspecifier>")
        return 1
    g = read_grammar_any(pos[1])
    fst = expand_grammar(g)
    with tempfile.NamedTemporaryFile(suffix=".fst",
                                     delete=False) as tf:
        write_fst(tf, fst)
        tmp = tf.name
    argv2 = ["online2-wav-nnet3-latgen-faster"] + \
        [tmp if a == pos[1] else a for a in argv[1:]]
    return online2_wav_nnet3_latgen_faster(argv2)


def online2_wav_nnet3_latgen_incremental(argv: List[str]) -> int:
    po = ParseOptions(
        "Online decoding with INCREMENTAL lattice determinization "
        "(online2-wav-nnet3-latgen-incremental.cc; the lattice is "
        "determinized in chunks as decoding proceeds).\n"
        "Usage: online2-wav-nnet3-latgen-incremental [options] "
        "<nnet3-in> <fst-in> <wav-rspecifier> <lattice-wspecifier>")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic "
        "likelihoods")
    beam = po.register_value("beam", 15.0, "Decoding beam")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Frame subsampling factor of the model")
    determinize_period = po.register_value(
        "determinize-period", 20,
        "Output frames between incremental determinizations")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.incremental import LatticeIncrementalDecoder
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    tm, graph, _ = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("raw model given (no transition model)")
        return 1
    hclg = read_fst_file(po.get_arg(2))
    fe = OfflineFeature(mfcc_opts)
    dec = LatticeIncrementalDecoder(
        hclg, LatticeFasterDecoderOptions(beam=beam[0]),
        chunk_frames=determinize_period[0])
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = 0
    for key, wave_data in SequentialTableReader("wave",
                                                po.get_arg(3)):
        feats = fe.compute(wave_data.channel(0))
        out = graph.forward(np.asarray(feats))
        ll = out[::sub[0]] if sub[0] > 1 else out
        res = dec.decode(ll, tm.id2pdf_id,
                         acoustic_scale=acoustic_scale[0])
        if res is None:
            warn(f"decode failed for {key}")
            continue
        writer.write(key, res)
        n += 1
    writer.close()
    log(f"decoded {n} utterances (incremental determinization)")
    return 0 if n else 1


# ======================================================================
# Batched nnet3 compute (nnet3-compute-batch.cc,
# nnet3-xvector-compute-batched.cc: the NnetBatchComputer surface —
# here one padded device batch per bucket)
# ======================================================================

def nnet3_compute_batch(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate features through the network in BATCHES (the "
        "NnetBatchComputer path, nnet3-compute-batch.cc): utterances "
        "are padded into device batches instead of evaluated one by "
        "one.\nUsage: nnet3-compute-batch [options] <model> "
        "<features-rspecifier> <matrix-wspecifier>")
    batch_size = po.register_value("batch-size", 32,
                                   "Utterances per device batch")
    use_xent = po.register_value("use-xent-output", False,
                                 "Use the output-xent head")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet3.jax_bridge import compile_graph
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    _, graph, _ = read_nnet3_any(po.get_arg(1))
    head = "output-xent" if use_xent[0] else "output"
    try:
        fn = jax.jit(compile_graph(graph, output_name=head))
    except Exception as e:
        warn(f"device path unavailable ({e}); host fallback")
        fn = None
    writer = TableWriter("matrix", po.get_arg(3))
    buf = []
    n = 0

    def flush():
        nonlocal n
        if not buf:
            return
        if fn is None:
            for k, f in buf:
                writer.write(k, graph.forward(f, output_name=head))
                n += 1
            buf.clear()
            return
        Tmax = max(f.shape[0] for _k, f in buf)
        Tmax = -(-Tmax // 8) * 8
        batch = np.zeros((len(buf), Tmax, buf[0][1].shape[1]),
                         np.float32)
        for i, (_k, f) in enumerate(buf):
            batch[i, :f.shape[0]] = f
        out = np.asarray(fn(jnp.asarray(batch)))
        rate = max(1, int(round(Tmax / max(out.shape[1], 1))))
        for i, (k, f) in enumerate(buf):
            writer.write(k, out[i, : -(-f.shape[0] // rate)])
            n += 1
        buf.clear()

    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        buf.append((key, np.asarray(feats, np.float32)))
        if len(buf) >= batch_size[0]:
            flush()
    flush()
    writer.close()
    log(f"batch-computed outputs for {n} utterances")
    return 0 if n else 1


def nnet3_xvector_compute_batched(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract xvectors in device batches "
        "(nnet3-xvector-compute-batched.cc).\n"
        "Usage: nnet3-xvector-compute-batched [options] <model-dir> "
        "<features-rspecifier> <vector-wspecifier>")
    batch_size = po.register_value("batch-size", 32,
                                   "Utterances per device batch")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import json
    import os

    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet3.xvector import (XvectorConfig, XvectorModel,
                                         extract_xvectors)
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    base = os.path.abspath(po.get_arg(1))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    cfg = XvectorConfig(**meta["config"])
    model = XvectorModel(cfg, train=False)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 30, cfg.feat_dim)))
    variables, _, _ = restore_checkpoint(base, template)
    writer = TableWriter("vector", po.get_arg(3))
    buf = []
    n = 0

    def flush():
        nonlocal n
        if not buf:
            return
        embs = extract_xvectors(model, variables,
                                [f for _k, f in buf])
        for (k, _f), e in zip(buf, embs):
            writer.write(k, e)
            n += 1
        buf.clear()

    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        buf.append((key, feats))
        if len(buf) >= batch_size[0]:
            flush()
    flush()
    writer.close()
    log(f"extracted {n} xvectors (batched)")
    return 0 if n else 1


def nnet3_egs_augment_image(argv: List[str]) -> int:
    po = ParseOptions(
        "Perturb image examples (nnet3-egs-augment-image.cc): random "
        "horizontal shift/flip of the feature rows viewed as "
        "(width, height*channels) images.\n"
        "Usage: nnet3-egs-augment-image [options] <egs-rspecifier> "
        "<egs-wspecifier>")
    horizontal_flip_prob = po.register_value(
        "horizontal-flip-prob", 0.0, "Probability of horizontal flip")
    horizontal_shift = po.register_value(
        "horizontal-shift", 0.0,
        "Max horizontal shift as a fraction of the image width")
    vertical_shift = po.register_value(
        "vertical-shift", 0.0,
        "Max vertical shift as a fraction of the image height")
    num_channels = po.register_value("num-channels", 1,
                                     "Number of color channels")
    seed = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ExampleHolder
    rng = np.random.default_rng(seed[0])
    writer = TableWriter(ExampleHolder(), po.get_arg(2))
    n = 0
    for key, eg in SequentialTableReader(ExampleHolder(),
                                         po.get_arg(1)):
        m = np.asarray(eg.feats, np.float32)
        W, HC = m.shape                      # width x (height*chan)
        H = HC // max(num_channels[0], 1)
        if horizontal_flip_prob[0] > 0 and \
                rng.random() < horizontal_flip_prob[0]:
            m = m[::-1].copy()
        if horizontal_shift[0] > 0:
            s = int(round(rng.uniform(-1, 1)
                          * horizontal_shift[0] * W))
            m = np.roll(m, s, axis=0)
        if vertical_shift[0] > 0 and H > 1:
            s = int(round(rng.uniform(-1, 1)
                          * vertical_shift[0] * H))
            img = m.reshape(W, H, -1)
            m = np.roll(img, s, axis=1).reshape(W, HC)
        eg.feats = m
        writer.write(key, eg)
        n += 1
    writer.close()
    log(f"augmented {n} image examples")
    return 0 if n else 1


# ======================================================================
# cudafeat surface -> batched device frontend (SURVEY §2.3 cudafeat;
# feature-online-batched-*-cuda.h).  One device program per batch.
# ======================================================================

def _batched_feats(argv, name, fbank: bool) -> int:
    po = ParseOptions(
        f"Compute {'fbank' if fbank else 'MFCC'} features in BATCHED "
        "device programs (cudafeatbin/" + name + ".cc; lanes = the "
        "batch dimension of one fused window/FFT/mel"
        + ("" if fbank else "/DCT") + " kernel).\n"
        f"Usage: {name} [options] <wav-rspecifier> "
        "<feats-wspecifier>")
    from kaldi_tpu.feat.frontend import FbankOptions, MfccOptions
    opts = FbankOptions() if fbank else MfccOptions()
    po.register_struct(opts)
    batch_size = po.register_value("batch-size", 64,
                                   "Utterances per device batch")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.frontend import OfflineFeature
    fe = OfflineFeature(opts)
    writer = TableWriter("matrix", po.get_arg(2))
    buf = []
    n = 0

    def flush():
        nonlocal n
        if not buf:
            return
        outs = fe.compute_batch([w for _k, w in buf])
        for (k, _w), m in zip(buf, outs):
            writer.write(k, m)
            n += 1
        buf.clear()

    for key, wave in SequentialTableReader("wave", po.get_arg(1)):
        buf.append((key, wave.channel(0)))
        if len(buf) >= batch_size[0]:
            flush()
    flush()
    writer.close()
    log(f"computed {n} feature matrices (batched device frontend)")
    return 0 if n else 1


def compute_mfcc_feats_cuda(argv: List[str]) -> int:
    return _batched_feats(argv, "compute-mfcc-feats-cuda", False)


def compute_fbank_feats_cuda(argv: List[str]) -> int:
    return _batched_feats(argv, "compute-fbank-feats-cuda", True)


def compute_mfcc_online_batched_cuda(argv: List[str]) -> int:
    return _batched_feats(argv, "compute-mfcc-online-batched-cuda",
                          False)


def compute_fbank_online_batched_cuda(argv: List[str]) -> int:
    return _batched_feats(argv, "compute-fbank-online-batched-cuda",
                          True)


class _MatrixSource:
    """Adapt a precomputed matrix to OnlineFeatureInterface."""

    def __init__(self, m):
        self.m = np.asarray(m, np.float32)

    def dim(self):
        return self.m.shape[1]

    def num_frames_ready(self):
        return self.m.shape[0]

    def is_last_frame(self, frame):
        return frame == self.m.shape[0] - 1

    def get_frame(self, t):
        return self.m[t]


def _apply_cmvn_online(argv, name) -> int:
    po = ParseOptions(
        "Apply ONLINE cepstral mean (+var) normalization, per "
        "utterance from the stream start (cudafeatbin/" + name +
        ".cc).\nUsage: " + name + " [options] <global-cmvn-stats> "
        "<feats-rspecifier> <feats-wspecifier>")
    from kaldi_tpu.online.features import (OnlineCmvn,
                                           OnlineCmvnOptions,
                                           OnlineCmvnState)
    opts = OnlineCmvnOptions()
    po.register_struct(opts)
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        binary = iof.init_input_stream(f)
        gstats = iof.read_matrix(f, binary)
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        state = OnlineCmvnState(global_cmvn_stats=np.asarray(
            gstats, np.float64))
        cm = OnlineCmvn(opts, state, _MatrixSource(feats))
        out = np.stack([cm.get_frame(t)
                        for t in range(feats.shape[0])])
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"applied online CMVN to {n} matrices")
    return 0 if n else 1


def apply_cmvn_online_cuda(argv: List[str]) -> int:
    return _apply_cmvn_online(argv, "apply-cmvn-online-cuda")


def apply_batched_cmvn_online_cuda(argv: List[str]) -> int:
    return _apply_cmvn_online(argv, "apply-batched-cmvn-online-cuda")


def _online_feats_pipeline(argv, name) -> int:
    po = ParseOptions(
        "Compute features + online i-vectors, the full online "
        "front-end (cudafeatbin/" + name + ".cc).\n"
        "Usage: " + name + " [options] <ivector-extractor (.npz)> "
        "<wav-rspecifier> <feats-wspecifier> <ivectors-wspecifier>")
    from kaldi_tpu.feat.frontend import MfccOptions
    opts = MfccOptions()
    po.register_struct(opts)
    ivector_period = po.register_value(
        "ivector-period", 10, "Frames between i-vector estimates")
    batch_size = po.register_value("batch-size", 64,
                                   "Utterances per device batch")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.ivector.batched import BatchedIvectorExtractor
    from kaldi_tpu.recipes.bench_corpus import load_ivector_extractor
    import jax.numpy as jnp
    bex = BatchedIvectorExtractor(
        load_ivector_extractor(po.get_arg(1)))
    fe = OfflineFeature(opts)
    fwriter = TableWriter("matrix", po.get_arg(3))
    iwriter = TableWriter("matrix", po.get_arg(4))
    buf = []
    n = 0

    def flush():
        nonlocal n
        if not buf:
            return
        feats = fe.compute_batch([w for _k, w in buf])
        Tmax = max(f.shape[0] for f in feats)
        batch = np.zeros((len(buf), Tmax, feats[0].shape[1]),
                         np.float32)
        lens = []
        for i, f in enumerate(feats):
            batch[i, :f.shape[0]] = f
            lens.append(f.shape[0])
        # per-period online i-vectors from the carried device state
        state = bex.init_state(len(buf))
        period = max(ivector_period[0], 1)
        ivs = [[] for _ in buf]
        for c0 in range(0, Tmax, period):
            chunk = jnp.asarray(batch[:, c0:c0 + period])
            mask = jnp.asarray(
                (np.arange(c0, min(c0 + period, Tmax))[None, :]
                 < np.asarray(lens)[:, None]))
            state = bex.acc_chunk(state, chunk, mask)
            iv = np.asarray(bex.ivector(state))
            for i in range(len(buf)):
                if c0 < lens[i]:
                    ivs[i].append(iv[i])
        for i, (k, _w) in enumerate(buf):
            fwriter.write(k, feats[i])
            iwriter.write(k, np.stack(ivs[i]))
            n += 1
        buf.clear()

    for key, wave in SequentialTableReader("wave", po.get_arg(2)):
        buf.append((key, wave.channel(0)))
        if len(buf) >= batch_size[0]:
            flush()
    flush()
    fwriter.close()
    iwriter.close()
    log(f"computed features + online i-vectors for {n} utterances")
    return 0 if n else 1


def compute_online_feats_cuda(argv: List[str]) -> int:
    return _online_feats_pipeline(argv, "compute-online-feats-cuda")


def compute_online_feats_batched_cuda(argv: List[str]) -> int:
    return _online_feats_pipeline(argv,
                                  "compute-online-feats-batched-cuda")


# ======================================================================
# cudadecoder surface -> batched device pipeline
# (cudadecoderbin/batched-wav-nnet3-cuda2.cc and friends)
# ======================================================================

def batched_wav_nnet3_cuda2(argv: List[str]) -> int:
    po = ParseOptions(
        "Batched offline decode: wav -> batched device features -> "
        "batched device AM forward -> lattices, with the RealTimeX "
        "metric of record (cudadecoderbin/batched-wav-nnet3-cuda2.cc:"
        "246-249). Search over the arbitrary HCLG runs on host "
        "workers (the device-search fast path needs a LexChain/Ngram "
        "graph — decoder/lexchain_ng.py — as used by bench.py).\n"
        "Usage: batched-wav-nnet3-cuda2 [options] <nnet3-in> <fst-in> "
        "<wav-rspecifier> <lattice-wspecifier>")
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    from kaldi_tpu.feat.frontend import MfccOptions
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic "
        "likelihoods")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Frame subsampling factor of the model")
    batch_size = po.register_value("max-batch-size", 64,
                                   "Utterances per device batch")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    import time

    import jax
    import jax.numpy as jnp
    from kaldi_tpu.decoder.lattice_decoder import LatticeFasterDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.jax_bridge import compile_graph
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    tm, graph, _ = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("need an .mdl with a transition model")
        return 1
    hclg = read_fst_file(po.get_arg(2))
    dec = LatticeFasterDecoder(hclg, dopts)
    fe = OfflineFeature(mfcc_opts)
    try:
        fwd = jax.jit(compile_graph(graph))
    except Exception as e:
        warn(f"device AM path unavailable ({e}); host fallback")
        fwd = None
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    buf = []
    n = 0
    total_audio = 0.0
    t_start = time.time()

    def flush():
        nonlocal n
        if not buf:
            return
        feats = fe.compute_batch([w for _k, w, _f in buf])
        if fwd is not None:
            Tmax = max(f.shape[0] for f in feats)
            Tmax = -(-Tmax // 8) * 8
            batch = np.zeros((len(buf), Tmax, feats[0].shape[1]),
                             np.float32)
            for i, f in enumerate(feats):
                batch[i, :f.shape[0]] = f
            out = np.asarray(fwd(jnp.asarray(batch)))
            lls = [out[i, : -(-feats[i].shape[0] // sub[0])]
                   for i in range(len(buf))]
        else:
            lls = [graph.forward(np.asarray(f))[::sub[0]]
                   for f in feats]
        for (k, _w, _f), ll in zip(buf, lls):
            lat = dec.decode(ll, tm.id2pdf_id, acoustic_scale[0])
            if lat is not None:
                writer.write(k, lat)
                n += 1
        buf.clear()

    for key, wave in SequentialTableReader("wave", po.get_arg(3)):
        buf.append((key, wave.channel(0), wave.samp_freq))
        total_audio += wave.duration
        if len(buf) >= batch_size[0]:
            flush()
    flush()
    writer.close()
    wall = time.time() - t_start
    log(f"decoded {n} utterances; Overall: Aggregate Total Time: "
        f"{wall:.4f} Total Audio: {total_audio:.4f} "
        f"RealTimeX: {total_audio / max(wall, 1e-9):.4f}")
    return 0 if n else 1


def batched_wav_nnet3_cuda(argv: List[str]) -> int:
    """cudadecoderbin/batched-wav-nnet3-cuda.cc — superseded by cuda2
    in the reference too; same pipeline here."""
    argv = ["batched-wav-nnet3-cuda2"] + argv[1:]
    return batched_wav_nnet3_cuda2(argv)


def batched_wav_nnet3_cuda_online(argv: List[str]) -> int:
    po = ParseOptions(
        "Batched ONLINE decode simulation: chunked audio through the "
        "online feature pipeline + per-chunk AM + online decoding "
        "(cudadecoderbin/batched-wav-nnet3-cuda-online.cc).\n"
        "Usage: batched-wav-nnet3-cuda-online [options] <nnet3-in> "
        "<fst-in> <wav-rspecifier> <words-wspecifier>")
    from kaldi_tpu.cli.online_tools import \
        online2_wav_nnet3_latgen_faster
    # the single-stream online wrapper already implements the chunked
    # contract; the batched-device-lane variant lives at the library
    # level (online/batched_device_pipeline.py) for LexChain graphs
    argv2 = ["online2-wav-nnet3-latgen-faster"] + argv[1:]
    return online2_wav_nnet3_latgen_faster(argv2)
