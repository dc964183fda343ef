"""Golden-bytes .mdl test (round-2 verdict weak #8): the byte blob
below is derived BY HAND from the reference writers — NOT from this
repo's exporter — so reader and writer are pinned against the
reference wire format independently of each other.

Transcribed write paths:
  hmm/hmm-topology.cc:165-231   HmmTopology::Write (binary branch)
  hmm/transition-model.cc:422   TransitionModel::Write
  matrix/kaldi-vector.cc        VectorBase<float>::Write  ("FV ")
  matrix/kaldi-matrix.cc        MatrixBase<float>::Write  ("FM ")
  nnet3/nnet-nnet.cc:630        Nnet::Write (config lines + components)
  nnet3/nnet-component-itf.cc:306 UpdatableComponent::WriteUpdatableCommon
  nnet3/nnet-simple-component.cc:1310 AffineComponent::Write
  nnet3/am-nnet-simple.cc:34    AmNnetSimple::Write (no header/footer)
  base/io-funcs.cc              WriteToken = token + ' ';
                                WriteBasicType<int32> = '\\x04' + LE i32
  base/io-funcs-inl.h           WriteIntegerVector = '\\x04' + i32 len
                                + raw LE i32s
"""

import math
import struct

import numpy as np
import pytest

LN_HALF = math.log(0.5)

# the logical model: one phone (id 1), standard 3-state Bakis topology
# (self 0.5 / forward 0.5), monophone pdfs 0/1/2 => 6 transition-ids;
# nnet3: input(dim 3) -> AffineComponent(3->2) -> output
W = np.array([[0.25, -0.5, 1.0], [2.0, 0.125, -1.5]], np.float32)
B = np.array([0.75, -0.25], np.float32)
PRIORS = np.array([0.5, 0.3, 0.2], np.float32)
LRATE = 0.001


def _tok(t: str) -> bytes:
    return t.encode() + b" "


def _i32(v: int) -> bytes:
    return b"\x04" + struct.pack("<i", v)


def _f32(v: float) -> bytes:
    return b"\x04" + struct.pack("<f", v)


def _ivec(vals) -> bytes:
    return b"\x04" + struct.pack("<i", len(vals)) + \
        b"".join(struct.pack("<i", v) for v in vals)


def _fvec(vals) -> bytes:
    a = np.asarray(vals, "<f4")
    return _tok("FV") + _i32(len(a)) + a.tobytes()


def _fmat(m) -> bytes:
    a = np.asarray(m, "<f4")
    return _tok("FM") + _i32(a.shape[0]) + _i32(a.shape[1]) + a.tobytes()


def golden_bytes() -> bytes:
    out = [b"\x00B"]                       # InitKaldiOutputStream
    # --- TransitionModel (transition-model.cc:422) ---
    out.append(_tok("<TransitionModel>"))
    # HmmTopology binary branch (hmm-topology.cc:208):
    out.append(_tok("<Topology>"))
    out.append(_ivec([1]))                 # phones_
    out.append(_ivec([-1, 0]))             # phone2idx_ (phone 0 unused)
    # is_hmm => no -1 marker
    out.append(_i32(1))                    # entries_.size()
    ent = [_i32(4)]                        # entry 0: 4 states
    for j in range(3):                     # emitting Bakis states
        ent.append(_i32(j))                # forward_pdf_class
        ent.append(_i32(2))                # transitions.size()
        ent.append(_i32(j) + _f32(0.5))    # self-loop
        ent.append(_i32(j + 1) + _f32(0.5))  # forward
    ent.append(_i32(-1))                   # final state: kNoPdf
    ent.append(_i32(0))                    # no transitions
    out.extend(ent)
    out.append(_tok("</Topology>"))
    out.append(_tok("<Triples>"))          # is_hmm => Triples
    out.append(_i32(3))
    for phone, state, pdf in [(1, 0, 0), (1, 1, 1), (1, 2, 2)]:
        out.append(_i32(phone) + _i32(state) + _i32(pdf))
    out.append(_tok("</Triples>"))
    out.append(_tok("<LogProbs>"))
    out.append(_fvec([0.0] + [LN_HALF] * 6))   # 1-based tids
    out.append(_tok("</LogProbs>"))
    out.append(_tok("</TransitionModel>"))
    # --- AmNnetSimple (am-nnet-simple.cc:34): nnet, contexts, priors
    out.append(_tok("<Nnet3>") + b"\n")    # nnet-nnet.cc:631-632
    out.append(b"input-node name=input dim=3\n")
    out.append(b"component-node name=aff component=aff input=input\n")
    out.append(b"output-node name=output input=aff objective=linear\n")
    out.append(b"\n")                      # blank line ends config
    out.append(_tok("<NumComponents>") + _i32(1))
    out.append(_tok("<ComponentName>") + _tok("aff"))
    # WriteUpdatableCommon: defaults => only opening tag + <LearningRate>
    out.append(_tok("<AffineComponent>"))
    out.append(_tok("<LearningRate>") + _f32(LRATE))
    out.append(_tok("<LinearParams>") + _fmat(W))
    out.append(_tok("<BiasParams>") + _fvec(B))
    out.append(_tok("</AffineComponent>"))
    out.append(_tok("</Nnet3>"))
    out.append(_tok("<LeftContext>") + _i32(0))
    out.append(_tok("<RightContext>") + _i32(0))
    out.append(_tok("<Priors>") + _fvec(PRIORS))
    return b"".join(out)


def _our_model():
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet3.mdl_io import (AffineComponent, Desc, Node,
                                        Nnet3Graph)
    from kaldi_tpu.tree import monophone_context_dependency
    topo = HmmTopology.three_state([1])
    tree = monophone_context_dependency([1], {1: 3})
    tm = TransitionModel(topo, tree)
    aff = AffineComponent()
    aff.fields = {"LearningRate": LRATE, "LinearParams": W.copy(),
                  "BiasParams": B.copy()}
    graph = Nnet3Graph(
        nodes=[Node("input", "input", dim=3),
               Node("component", "aff", component="aff",
                    desc=Desc("node", ["input"])),
               Node("output", "output",
                    desc=Desc("node", ["aff"]))],
        components={"aff": aff})
    return tm, graph


def test_reader_parses_golden(tmp_path):
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_am
    p = tmp_path / "golden.mdl"
    p.write_bytes(golden_bytes())
    tm, graph, info = read_nnet3_am(str(p))
    assert tm.num_transition_ids == 6
    assert tm.num_pdfs == 3
    assert tm.transition_id_to_pdf(1) == 0
    assert tm.transition_id_to_phone(6) == 1
    assert info["left_context"] == 0 and info["right_context"] == 0
    np.testing.assert_allclose(info["priors"], PRIORS)
    x = np.array([[1.0, -2.0, 0.5], [0.0, 1.0, 3.0]], np.float32)
    y = graph.forward(x)
    np.testing.assert_allclose(y, x @ W.T + B, rtol=1e-6)


def test_writer_matches_golden(tmp_path):
    from kaldi_tpu.nnet3.mdl_io import write_nnet3_am
    tm, graph = _our_model()
    p = tmp_path / "ours.mdl"
    write_nnet3_am(str(p), tm, graph, priors=PRIORS)
    ours = p.read_bytes()
    want = golden_bytes()
    if ours != want:
        n = min(len(ours), len(want))
        i = next((k for k in range(n) if ours[k] != want[k]), n)
        ctx = slice(max(0, i - 40), i + 40)
        pytest.fail(f"byte mismatch at {i}:\n ours: {ours[ctx]!r}\n"
                    f" want: {want[ctx]!r}\n"
                    f" lens: {len(ours)} vs {len(want)}")
