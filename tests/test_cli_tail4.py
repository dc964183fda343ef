"""Round-3 CLI tail batch 2: posterior ops, model/tree copy, matrix
utilities."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture()
def post_ark(tmp_path):
    post = [[(1, 0.6), (2, 0.4)], [(3, 1.0)], []]
    with TableWriter("posterior", f"ark:{tmp_path}/p.ark") as w:
        w.write("u1", post)
    return post


def read_post(path):
    return dict(SequentialTableReader("posterior", f"ark:{path}"))


def test_copy_and_scale_post(tmp_path, post_ark):
    rc = get_tool("copy-post")(["copy-post", "--scale=0.5",
                                f"ark:{tmp_path}/p.ark",
                                f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_post(f"{tmp_path}/o.ark")["u1"]
    assert out[0][0][1] == pytest.approx(0.3, abs=1e-5)
    with TableWriter("float", f"ark:{tmp_path}/s.ark") as w:
        w.write("u1", 2.0)
    rc = get_tool("scale-post")(["scale-post", f"ark:{tmp_path}/p.ark",
                                 f"ark:{tmp_path}/s.ark",
                                 f"ark:{tmp_path}/o2.ark"])
    assert rc == 0
    out = read_post(f"{tmp_path}/o2.ark")["u1"]
    assert out[0][0][1] == pytest.approx(1.2, abs=1e-5)


def test_sum_and_weight_post(tmp_path, post_ark):
    rc = get_tool("sum-post")(["sum-post", f"ark:{tmp_path}/p.ark",
                               f"ark:{tmp_path}/p.ark",
                               f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_post(f"{tmp_path}/o.ark")["u1"]
    assert out[0][0][1] == pytest.approx(1.2, abs=1e-5)
    with TableWriter("vector", f"ark:{tmp_path}/w.ark") as w:
        w.write("u1", np.asarray([0.0, 1.0, 1.0], np.float32))
    rc = get_tool("weight-post")(["weight-post", f"ark:{tmp_path}/p.ark",
                                  f"ark:{tmp_path}/w.ark",
                                  f"ark:{tmp_path}/o2.ark"])
    assert rc == 0
    out = read_post(f"{tmp_path}/o2.ark")["u1"]
    assert out[0][0][1] == pytest.approx(0.0, abs=1e-6)
    assert out[1][0][1] == pytest.approx(1.0, abs=1e-6)


@pytest.fixture()
def tiny_model(tmp_path):
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    from kaldi_tpu.util.kaldi_io import write_kaldi_object
    phones = [1, 2]
    topo = HmmTopology.chain_topology(phones)
    tree = monophone_context_dependency(phones, {p: 2 for p in phones})
    tm = TransitionModel(topo, tree)
    write_kaldi_object(tm.write, str(tmp_path / "trans.mdl"))
    return tm, tree


def test_post_mapping(tmp_path, tiny_model):
    tm, _tree = tiny_model
    post = [[(1, 0.7), (2, 0.3)]]
    with TableWriter("posterior", f"ark:{tmp_path}/p.ark") as w:
        w.write("u1", post)
    rc = get_tool("post-to-pdf-post")(
        ["post-to-pdf-post", str(tmp_path / "trans.mdl"),
         f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = read_post(f"{tmp_path}/o.ark")["u1"]
    want = {}
    for tid, p in post[0]:
        pdf = tm.transition_id_to_pdf(tid)
        want[pdf] = want.get(pdf, 0.0) + p
    assert dict(out[0]) == pytest.approx(want, abs=1e-5)
    rc = get_tool("post-to-phone-post")(
        ["post-to-phone-post", str(tmp_path / "trans.mdl"),
         f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/ph.ark"])
    assert rc == 0


def test_copy_transition_model_and_tree(tmp_path, tiny_model, capsys):
    tm, tree = tiny_model
    from kaldi_tpu.util.kaldi_io import write_kaldi_object
    write_kaldi_object(tree.write, str(tmp_path / "tree"))
    rc = get_tool("copy-transition-model")(
        ["copy-transition-model", str(tmp_path / "trans.mdl"),
         str(tmp_path / "t2.mdl")])
    assert rc == 0
    rc = get_tool("copy-tree")(["copy-tree", str(tmp_path / "tree"),
                                str(tmp_path / "tree2")])
    assert rc == 0
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util.kaldi_io import read_kaldi_object
    tm2 = read_kaldi_object(TransitionModel.read, str(tmp_path / "t2.mdl"))
    assert tm2.num_transition_ids == tm.num_transition_ids
    rc = get_tool("show-transitions")(
        ["show-transitions", "-", str(tmp_path / "trans.mdl")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Transition-state 1" in out


def test_matrix_tools(tmp_path, capsys):
    m = np.arange(12, dtype=np.float32).reshape(4, 3)
    with TableWriter("matrix", f"ark:{tmp_path}/m.ark") as w:
        w.write("u1", m)
    rc = get_tool("matrix-dim")(["matrix-dim", f"ark:{tmp_path}/m.ark"])
    assert rc == 0
    assert "u1\t4\t3" in capsys.readouterr().out
    rc = get_tool("matrix-scale")(["matrix-scale", "--scale=2.0",
                                   f"ark:{tmp_path}/m.ark",
                                   f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/o.ark"))
    np.testing.assert_allclose(out["u1"], m * 2)
    (tmp_path / "ranges").write_text("seg1 u1 1 3\n")
    rc = get_tool("extract-rows")(
        ["extract-rows", str(tmp_path / "ranges"),
         f"ark:{tmp_path}/m.ark", f"ark:{tmp_path}/r.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/r.ark"))
    np.testing.assert_allclose(out["seg1"], m[1:3])
