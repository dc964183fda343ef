"""Native ark index (native/kt_native.cpp ark_scan_matrices): lazy
random access over plain binary matrix archives via a C++ scan + one
mmap — no whole-archive materialization (parity: the reference's C++
RandomAccessTableReader streams from disk)."""

import numpy as np
import pytest

from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


@pytest.fixture()
def mats(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"utt{i:03d}": rng.normal(size=(rng.integers(5, 40),
                                            13)).astype(np.float32)
            for i in range(40)}
    with TableWriter("matrix", f"ark:{tmp_path}/m.ark") as w:
        for k, m in mats.items():
            w.write(k, m)
    return mats


def test_native_scan_entries(tmp_path, mats):
    from kaldi_tpu.native import ark_matrix_entries, get_lib
    if get_lib() is None:
        pytest.skip("no native toolchain")
    entries = ark_matrix_entries(f"{tmp_path}/m.ark")
    assert entries is not None and len(entries) == len(mats)
    for key, off, r, c, dt in entries:
        assert mats[key].shape == (r, c) and dt == np.dtype("<f4")


def test_lazy_random_access_equivalence(tmp_path, mats):
    from kaldi_tpu.native import get_lib
    reader = RandomAccessTableReader("matrix", f"ark:{tmp_path}/m.ark")
    keys = sorted(mats)
    # access out of order, repeatedly
    for k in keys[::3] + keys[::-1]:
        assert k in reader
        np.testing.assert_array_equal(reader[k], mats[k])
    assert "nope" not in reader
    with pytest.raises(KeyError):
        reader["nope"]
    assert set(reader.keys()) == set(keys)
    if get_lib() is not None:
        assert reader._lazy is not None      # fast path engaged
        assert reader._data is None          # nothing materialized


def test_text_ark_falls_back(tmp_path, mats):
    with TableWriter("matrix", f"ark,t:{tmp_path}/t.ark") as w:
        for k, m in mats.items():
            w.write(k, m)
    reader = RandomAccessTableReader("matrix", f"ark:{tmp_path}/t.ark")
    k = sorted(mats)[0]
    np.testing.assert_allclose(reader[k], mats[k], atol=1e-4)
    assert reader._lazy is None              # python path


def test_double_matrix_entries(tmp_path):
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.native import get_lib
    rng = np.random.default_rng(1)
    m64 = rng.normal(size=(7, 3))            # float64 -> DM
    with open(f"{tmp_path}/d.ark", "wb") as f:
        iof.write_token(f, True, "u1")
        iof.init_output_stream(f, True)
        iof.write_matrix(f, True, m64)
    reader = RandomAccessTableReader("matrix", f"ark:{tmp_path}/d.ark")
    np.testing.assert_allclose(reader["u1"], m64, atol=1e-12)
