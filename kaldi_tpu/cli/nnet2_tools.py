"""nnet2-generation CLIs over the thin importer (kaldi_tpu/nnet2):
nnet-am-info, nnet-am-copy, nnet-am-compute, nnet-to-raw-nnet,
raw-nnet-info, raw-nnet-copy, raw-nnet-concat, nnet1-to-raw-nnet
(src/nnet2bin).  The nnet2 TRAINING stack is deliberately not
reproduced — capability-once lives in nnet3 (SURVEY §2.10); these
tools cover reading, inspecting, converting and running legacy
models."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def raw_nnet_info(argv: List[str]) -> int:
    po = ParseOptions("Print human-readable information about a raw "
                      "nnet2 neural net.\n"
                      "Usage: raw-nnet-info <raw-nnet-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2
    print(read_raw_nnet2(po.get_arg(1)).info())
    return 0


def raw_nnet_copy(argv: List[str]) -> int:
    po = ParseOptions("Copy a raw nnet2 neural net, possibly changing "
                      "the binary mode or learning rate.\n"
                      "Usage: raw-nnet-copy [options] <raw-nnet-in> "
                      "<raw-nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    lr = po.register_value("learning-rate", -1.0,
                           "If supplied, set the learning rate of any "
                           "updatable components to this value")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2, write_raw_nnet2
    nnet = read_raw_nnet2(po.get_arg(1))
    if lr[0] >= 0:
        for c in nnet.components:
            if "LearningRate" in c.fields:
                c.fields["LearningRate"] = lr[0]
    write_raw_nnet2(nnet, po.get_arg(2), binary[0])
    return 0


def raw_nnet_concat(argv: List[str]) -> int:
    po = ParseOptions("Concatenate the components of two raw nnet2 "
                      "nets (output dim of the first must equal input "
                      "dim of the second).\n"
                      "Usage: raw-nnet-concat [options] <raw-nnet1-in> "
                      "<raw-nnet2-in> <raw-nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import Nnet2, read_raw_nnet2, write_raw_nnet2
    a = read_raw_nnet2(po.get_arg(1))
    b = read_raw_nnet2(po.get_arg(2))
    if a.output_dim() != b.input_dim():
        warn(f"dim mismatch: {a.output_dim()} vs {b.input_dim()}")
        return 1
    write_raw_nnet2(Nnet2(a.components + b.components), po.get_arg(3),
                    binary[0])
    return 0


def nnet_am_info(argv: List[str]) -> int:
    po = ParseOptions("Print human-readable information about an "
                      "nnet2 acoustic model.\n"
                      "Usage: nnet-am-info <nnet-am-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_nnet2_am
    tm, am = read_nnet2_am(po.get_arg(1))
    print(f"num-pdfs {tm.num_pdfs}")
    print(f"prior-dimension {len(am.priors)}")
    print(am.nnet.info())
    return 0


def nnet_am_copy(argv: List[str]) -> int:
    po = ParseOptions("Copy an nnet2 acoustic model, possibly "
                      "converting to text or extracting the raw net.\n"
                      "Usage: nnet-am-copy [options] <nnet-am-in> "
                      "<nnet-am-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    raw = po.register_value("raw", False,
                            "If true, write only the raw neural net, "
                            "without transition model or priors")
    lr = po.register_value("learning-rate", -1.0,
                           "If supplied, set all learning rates")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import (read_nnet2_am, write_nnet2_am,
                                 write_raw_nnet2)
    tm, am = read_nnet2_am(po.get_arg(1))
    if lr[0] >= 0:
        for c in am.nnet.components:
            if "LearningRate" in c.fields:
                c.fields["LearningRate"] = lr[0]
    if raw[0]:
        write_raw_nnet2(am.nnet, po.get_arg(2), binary[0])
    else:
        write_nnet2_am(po.get_arg(2), tm, am, binary[0])
    return 0


def nnet_to_raw_nnet(argv: List[str]) -> int:
    po = ParseOptions("Extract the raw neural net from an nnet2 "
                      "acoustic model.\n"
                      "Usage: nnet-to-raw-nnet [options] <nnet-am-in> "
                      "<raw-nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_nnet2_am, write_raw_nnet2
    _tm, am = read_nnet2_am(po.get_arg(1))
    write_raw_nnet2(am.nnet, po.get_arg(2), binary[0])
    return 0


def nnet_am_compute(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate features through an nnet2 acoustic model (outputs "
        "pseudo-log-likelihoods by default: log posterior minus log "
        "prior, nnet-am-compute.cc).\n"
        "Usage: nnet-am-compute [options] <nnet-am-in> "
        "<feature-rspecifier> <output-wspecifier>")
    apply_log = po.register_value("apply-log", False,
                                  "Apply log to the nnet output")
    pad = po.register_value("pad-input", True,
                            "If true, pad the input by the net's "
                            "left/right context so output rows == "
                            "input rows")
    divide = po.register_value("divide-by-priors", False,
                               "Divide the posteriors by the stored "
                               "priors (and take log)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_nnet2_am
    _tm, am = read_nnet2_am(po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        out = am.nnet.forward(np.asarray(feats, np.float32),
                              pad_input=pad[0])
        if divide[0]:
            pri = np.maximum(am.priors, 1e-20)
            out = np.log(np.maximum(out, 1e-20)) - np.log(pri)
        elif apply_log[0]:
            out = np.log(np.maximum(out, 1e-20))
        writer.write(key, out.astype(np.float32))
        n += 1
    writer.close()
    log(f"nnet-am-compute: processed {n} utterances")
    return 0 if n else 1


def nnet1_to_raw_nnet(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert an nnet1 neural net to a raw nnet2 net "
        "(nnet1-to-raw-nnet.cc: AffineTransform -> AffineComponent, "
        "Splice -> SpliceComponent, Sigmoid/Softmax/Tanh, AddShift -> "
        "FixedBiasComponent, Rescale -> FixedScaleComponent).\n"
        "Usage: nnet1-to-raw-nnet [options] <nnet1-in> <raw-nnet2-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet1.nnet import Nnet as Nnet1
    from kaldi_tpu.nnet2 import Nnet2, write_raw_nnet2
    from kaldi_tpu.nnet2.model import (AffineComponent, FixedBiasComponent,
                                       FixedScaleComponent,
                                       SigmoidComponent, SoftmaxComponent,
                                       SpliceComponent, TanhComponent)
    n1 = kaldi_io.read_kaldi_object(Nnet1.read, po.get_arg(1))
    comps = []
    for c in n1.components:
        t = type(c).__name__
        if t == "AffineTransform":
            comps.append(AffineComponent(
                LearningRate=0.001, LinearParams=c.linearity,
                BiasParams=c.bias, IsGradient=False))
        elif t == "Splice":
            comps.append(SpliceComponent(
                InputDim=c.in_dim, Context=list(c.frame_offsets),
                ConstComponentDim=0))
        elif t == "Sigmoid":
            comps.append(SigmoidComponent(Dim=c.out_dim))
        elif t == "Tanh":
            comps.append(TanhComponent(Dim=c.out_dim))
        elif t in ("Softmax", "HiddenSoftmax"):
            comps.append(SoftmaxComponent(Dim=c.out_dim))
        elif t == "AddShift":
            comps.append(FixedBiasComponent(Bias=c.shift))
        elif t == "Rescale":
            comps.append(FixedScaleComponent(Scales=c.scale))
        else:
            warn(f"nnet1-to-raw-nnet: cannot convert component {t}")
            return 1
    write_raw_nnet2(Nnet2(comps), po.get_arg(2), binary[0])
    log(f"converted {len(comps)} components")
    return 0
