"""Tests for base I/O primitives, table system, and compressed matrices.

Mirrors the reference's test strategy (SURVEY.md §4): randomized
round-trip checks plus byte-level golden checks of the wire format."""

import io
import os

import numpy as np
import pytest

from kaldi_tpu.base import io_funcs
from kaldi_tpu.matrix.compressed import (read_compressed_matrix_body,
                                         write_compressed_matrix)
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  RandomAccessTableReaderMapped,
                                  SequentialTableReader, TableWriter,
                                  parse_rspecifier, parse_wspecifier)


def roundtrip(write_fn, read_fn, binary):
    buf = io.BytesIO()
    write_fn(buf, binary)
    buf.seek(0)
    return read_fn(io.BufferedReader(buf), binary)


class TestBasicTypes:
    @pytest.mark.parametrize("binary", [True, False])
    def test_int32(self, binary):
        for v in [0, 1, -1, 2**31 - 1, -2**31]:
            got = roundtrip(lambda s, b: io_funcs.write_int32(s, b, v),
                            io_funcs.read_int32, binary)
            assert got == v

    @pytest.mark.parametrize("binary", [True, False])
    def test_float(self, binary):
        for v in [0.0, 1.5, -3.25, 1e-20, 1e20]:
            got = roundtrip(lambda s, b: io_funcs.write_float(s, b, v),
                            io_funcs.read_float, binary)
            assert got == pytest.approx(v, rel=1e-6)

    @pytest.mark.parametrize("binary", [True, False])
    def test_bool_token(self, binary):
        assert roundtrip(lambda s, b: io_funcs.write_bool(s, b, True),
                         io_funcs.read_bool, binary) is True
        got = roundtrip(lambda s, b: io_funcs.write_token(s, b, "<Foo>"),
                        io_funcs.read_token, binary)
        assert got == "<Foo>"

    @pytest.mark.parametrize("binary", [True, False])
    def test_int_vector(self, binary):
        for vec in [[], [5], [1, 2, 3, -7, 100000]]:
            got = roundtrip(lambda s, b: io_funcs.write_int_vector(s, b, vec),
                            io_funcs.read_int_vector, binary)
            assert got == vec

    def test_binary_int32_wire_format(self):
        buf = io.BytesIO()
        io_funcs.write_int32(buf, True, 258)
        assert buf.getvalue() == b"\x04\x02\x01\x00\x00"


class TestMatrixVector:
    @pytest.mark.parametrize("binary", [True, False])
    @pytest.mark.parametrize("shape", [(3, 5), (1, 1), (10, 2)])
    def test_matrix_roundtrip(self, binary, shape):
        rng = np.random.default_rng(0)
        m = rng.normal(size=shape).astype(np.float32)
        got = roundtrip(lambda s, b: io_funcs.write_matrix(s, b, m),
                        io_funcs.read_matrix, binary)
        tol = 0 if binary else 1e-5
        np.testing.assert_allclose(got, m, atol=tol)

    @pytest.mark.parametrize("binary", [True, False])
    def test_vector_roundtrip(self, binary):
        v = np.linspace(-2, 2, 17, dtype=np.float32)
        got = roundtrip(lambda s, b: io_funcs.write_vector(s, b, v),
                        io_funcs.read_vector, binary)
        tol = 0 if binary else 1e-5
        np.testing.assert_allclose(got, v, atol=tol)

    def test_double_matrix(self):
        m = np.random.default_rng(1).normal(size=(4, 4))
        got = roundtrip(lambda s, b: io_funcs.write_matrix(s, b, m),
                        io_funcs.read_matrix, True)
        np.testing.assert_array_equal(got, m)

    def test_matrix_binary_wire_format(self):
        m = np.zeros((2, 3), dtype=np.float32)
        buf = io.BytesIO()
        io_funcs.write_matrix(buf, True, m)
        data = buf.getvalue()
        assert data.startswith(b"FM \x04\x02\x00\x00\x00\x04\x03\x00\x00\x00")
        assert len(data) == 13 + 24


class TestCompressedMatrix:
    @pytest.mark.parametrize("method", [1, 2, 3, 5])
    def test_roundtrip_accuracy(self, method):
        rng = np.random.default_rng(2)
        m = rng.normal(size=(50, 13)).astype(np.float32) * 5.0
        buf = io.BytesIO()
        write_compressed_matrix(buf, m, method)
        buf.seek(0)
        tok = io_funcs.read_token(buf, True)
        got = read_compressed_matrix_body(buf, tok)
        rel = np.abs(got - m).max() / np.abs(m).max()
        # CM2 is 16-bit (~1e-4); CM/CM3 are 8-bit (~1%)
        assert rel < (2e-4 if tok == "CM2" else 0.02)

    def test_read_via_read_matrix(self):
        m = np.random.default_rng(3).normal(size=(20, 7)).astype(np.float32)
        buf = io.BytesIO()
        write_compressed_matrix(buf, m, 2)
        buf.seek(0)
        got = io_funcs.read_matrix(io.BufferedReader(buf), True)
        assert np.abs(got - m).max() < 0.05

    def test_cm_byte_layout_matches_reference(self):
        """Pin the CM wire layout to the reference CompressedMatrix
        (compressed-matrix.cc:149-156, Write at :531): after 'CM '
        and the 16-byte global header (minus the in-memory format
        int), ALL per-column headers are contiguous (cols x 4 uint16),
        followed by the uint8 data column-major. (True binary
        cross-validation vs reference tools is impossible here — the
        reference is not built and no CBLAS exists to build it — so
        this pins the structure the ADVICE bug violated.)"""
        rng = np.random.default_rng(7)
        rows, cols = 11, 3
        m = rng.normal(size=(rows, cols)).astype(np.float32)
        buf = io.BytesIO()
        write_compressed_matrix(buf, m, 2)
        data = buf.getvalue()
        assert data[:3] == b"CM "
        import struct
        min_value, rng_v, r, c = struct.unpack("<ffii", data[3:19])
        assert (r, c) == (rows, cols)
        assert len(data) == 19 + cols * 8 + rows * cols
        headers = np.frombuffer(data[19:19 + cols * 8],
                                dtype="<u2").reshape(cols, 4)
        # per-column headers must be monotone percentiles p0<p25<p75<p100
        assert (np.diff(headers.astype(np.int64), axis=1) > 0).all()
        body = np.frombuffer(data[19 + cols * 8:], dtype=np.uint8) \
            .reshape(cols, rows)
        # column-major: bytes for column c must decode to column c of m.
        # Each column's quantized bytes must be ordered like the column
        # values (quantization is monotone within a column).
        for ci in range(cols):
            order = np.argsort(m[:, ci], kind="stable")
            qsorted = body[ci][order]
            assert (np.diff(qsorted.astype(np.int64)) >= 0).all(), \
                f"column {ci} bytes are not column-major for that column"

    def test_tiny_matrices(self):
        for rows in [1, 2, 3, 4, 5]:
            m = np.random.default_rng(rows).normal(size=(rows, 3)).astype(np.float32)
            buf = io.BytesIO()
            write_compressed_matrix(buf, m, 2)
            buf.seek(0)
            tok = io_funcs.read_token(buf, True)
            got = read_compressed_matrix_body(buf, tok)
            assert got.shape == m.shape


class _TrickleRaw(io.RawIOBase):
    """Raw stream that returns ONE byte per read — models a slow pipe,
    where BufferedReader.peek(n) can return fewer than n bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def readable(self):
        return True

    def readinto(self, b):
        if self.pos >= len(self.data):
            return 0
        b[0] = self.data[self.pos]
        self.pos += 1
        return 1


def _trickle(data: bytes):
    """A non-seekable stream that yields 1 byte per raw read, wrapped
    the way kaldi_io.open_input wraps pipes/stdin."""
    return io_funcs.PeekableReader(io.BufferedReader(_TrickleRaw(data)))


class TestPeekOnSlowPipes:
    def test_init_input_stream_binary_on_trickle(self):
        m = np.arange(6, dtype=np.float32).reshape(2, 3)
        buf = io.BytesIO()
        io_funcs.init_output_stream(buf, True)
        io_funcs.write_matrix(buf, True, m)
        f = _trickle(buf.getvalue())
        assert io_funcs.init_input_stream(f) is True
        got = io_funcs.read_matrix(f, True)
        np.testing.assert_array_equal(got, m)

    def test_init_input_stream_text_on_trickle(self):
        f = _trickle(b"hello world")
        assert io_funcs.init_input_stream(f) is False
        assert f.read(5) == b"hello"

    def test_peek_token_on_trickle(self):
        f = _trickle(b"<SomeToken> rest")
        assert io_funcs.peek_token(f, True) == "<SomeToken>"
        assert io_funcs.read_token(f, True) == "<SomeToken>"

    def test_peek_bytes_eof(self):
        f = _trickle(b"ab")
        assert io_funcs.peek_bytes(f, 5) == b"ab"

    def test_peek_bytes_drained_buffered_file(self, tmp_path):
        """BufferedReader over a file whose buffer is nearly drained:
        peek(2) returns 1 byte; peek_bytes must fall back to
        read+seek and return both."""
        p = tmp_path / "f.bin"
        p.write_bytes(b"x" * 8191 + b"\x00B" + b"rest")
        with open(p, "rb") as f:
            f.read(8191)  # drain all but 1 byte of the 8K buffer
            assert io_funcs.peek_bytes(f, 2) == b"\x00B"
            assert f.read(2) == b"\x00B"


class TestBuildTreeStatsFormat:
    def test_roundtrip_and_layout(self):
        """BuildTreeStats wire format (build-tree-utils.cc:29):
        BTS + count + per entry EV event + bool + GCL clusterable."""
        from kaldi_tpu.tree.clusterable import (
            GaussClusterable, read_build_tree_stats, write_build_tree_stats)
        rng = np.random.default_rng(0)
        stats = {}
        for ev in [((-1, 2), (0, 5), (1, 3)), ((0, 7),)]:
            c = GaussClusterable(4, 0.01)
            c.accumulate(rng.normal(size=(10, 4)))
            stats[ev] = c
        for binary in (True, False):
            buf = io.BytesIO()
            write_build_tree_stats(buf, binary, stats)
            if binary:
                data = buf.getvalue()
                # \xfc: sizes here are uint32 in the reference (the
                # negative size byte marks unsignedness,
                # io-funcs-inl.h; pinned by tests/test_ref_golden.py
                # against reference-written bytes)
                assert data.startswith(b"BTS \xfc\x02\x00\x00\x00EV ")
            buf.seek(0)
            got = read_build_tree_stats(buf, binary)
            assert set(got) == set(stats)
            for ev in stats:
                np.testing.assert_allclose(got[ev].stats_sum,
                                           stats[ev].stats_sum, rtol=1e-6)
                assert got[ev].count == pytest.approx(stats[ev].count)


class TestSpecifiers:
    def test_rspecifier(self):
        kind, rx, opts = parse_rspecifier("ark,s,cs:foo.ark")
        assert (kind, rx) == ("ark", "foo.ark")
        assert opts.sorted and opts.called_sorted
        kind, rx, opts = parse_rspecifier("scp,p:a b c.scp")
        assert (kind, rx, opts.permissive) == ("scp", "a b c.scp", True)

    def test_wspecifier(self):
        kind, ark, scp, opts = parse_wspecifier("ark,scp:f.ark,f.scp")
        assert (kind, ark, scp) == ("ark,scp", "f.ark", "f.scp")
        kind, ark, scp, opts = parse_wspecifier("ark,t:-")
        assert (kind, ark, opts.binary) == ("ark", "-", False)


class TestTables:
    def _write_archive(self, tmp_path, wspec_fmt="ark:{}", binary=True):
        rng = np.random.default_rng(4)
        data = {f"utt{i:02d}": rng.normal(size=(5 + i, 4)).astype(np.float32)
                for i in range(5)}
        ark = tmp_path / "feats.ark"
        spec = wspec_fmt.format(ark)
        with TableWriter("matrix", spec if binary else "ark,t:" + str(ark)) as w:
            for k, v in data.items():
                w.write(k, v)
        return data, ark

    @pytest.mark.parametrize("binary", [True, False])
    def test_sequential_roundtrip(self, tmp_path, binary):
        data, ark = self._write_archive(tmp_path, binary=binary)
        got = dict(SequentialTableReader("matrix", f"ark:{ark}"))
        assert list(got) == list(data)
        for k in data:
            np.testing.assert_allclose(got[k], data[k],
                                       atol=0 if binary else 1e-5)

    def test_ark_scp_writing_and_random_access(self, tmp_path):
        rng = np.random.default_rng(5)
        data = {f"u{i}": rng.normal(size=(3, 2)).astype(np.float32)
                for i in range(4)}
        ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
        with TableWriter("matrix", f"ark,scp:{ark},{scp}") as w:
            for k, v in data.items():
                w.write(k, v)
        # sequential over the scp
        got = dict(SequentialTableReader("matrix", f"scp:{scp}"))
        for k in data:
            np.testing.assert_array_equal(got[k], data[k])
        # random access over the scp, out of order
        ra = RandomAccessTableReader("matrix", f"scp:{scp}")
        for k in reversed(list(data)):
            assert k in ra
            np.testing.assert_array_equal(ra[k], data[k])
        assert "nokey" not in ra

    def test_random_access_ark(self, tmp_path):
        data, ark = self._write_archive(tmp_path)
        ra = RandomAccessTableReader("matrix", f"ark:{ark}")
        np.testing.assert_array_equal(ra["utt03"], data["utt03"])

    def test_mapped_reader(self, tmp_path):
        cmvn = {"spkA": np.ones((2, 5), np.float32)}
        ark = tmp_path / "cmvn.ark"
        with TableWriter("matrix", f"ark:{ark}") as w:
            w.write("spkA", cmvn["spkA"])
        u2s = tmp_path / "utt2spk"
        u2s.write_text("utt1 spkA\nutt2 spkA\n")
        r = RandomAccessTableReaderMapped("matrix", f"ark:{ark}", f"ark:{u2s}")
        assert "utt1" in r and "utt2" in r and "utt3" not in r
        np.testing.assert_array_equal(r["utt2"], cmvn["spkA"])

    def test_int_vector_table(self, tmp_path):
        ali = {"a": [1, 2, 3], "b": [7]}
        ark = tmp_path / "ali.ark"
        with TableWriter("int-vector", f"ark:{ark}") as w:
            for k, v in ali.items():
                w.write(k, v)
        got = dict(SequentialTableReader("int-vector", f"ark:{ark}"))
        assert got == ali

    def test_text_tables(self, tmp_path):
        txt = tmp_path / "text"
        txt.write_text("utt1 HELLO WORLD\nutt2 YES\n")
        got = dict(SequentialTableReader("token-vector", f"ark:{txt}"))
        assert got == {"utt1": ["HELLO", "WORLD"], "utt2": ["YES"]}

    def test_pipe_input(self, tmp_path):
        data, ark = self._write_archive(tmp_path)
        got = dict(SequentialTableReader("matrix", f"ark:cat {ark}|"))
        assert len(got) == len(data)

    def test_gzip_archive(self, tmp_path):
        ark = tmp_path / "x.ark.gz"
        with TableWriter("int-vector", f"ark:{ark}") as w:
            w.write("k", [9, 8])
        got = dict(SequentialTableReader("int-vector", f"ark:{ark}"))
        assert got == {"k": [9, 8]}

    def test_compressed_writer(self, tmp_path):
        m = np.random.default_rng(6).normal(size=(30, 13)).astype(np.float32)
        ark = tmp_path / "c.ark"
        with TableWriter("compressed-matrix", f"ark:{ark}") as w:
            w.write("u", m)
        got = dict(SequentialTableReader("matrix", f"ark:{ark}"))
        assert np.abs(got["u"] - m).max() < 0.05


class TestExtendedFilenames:
    def test_classify(self):
        assert kaldi_io.classify_rxfilename("-") == "standard"
        assert kaldi_io.classify_rxfilename("gunzip -c x.gz|") == "pipe"
        assert kaldi_io.classify_rxfilename("foo.ark:123") == "offset"
        assert kaldi_io.classify_rxfilename("foo.ark") == "file"
        assert kaldi_io.classify_wxfilename("|gzip>x.gz") == "pipe"

    def test_offset_read(self, tmp_path):
        p = tmp_path / "data.bin"
        p.write_bytes(b"junkHELLO")
        with kaldi_io.input_stream(f"{p}:4") as f:
            assert f.read() == b"HELLO"

    def test_object_io(self, tmp_path):
        m = np.random.default_rng(7).normal(size=(3, 3)).astype(np.float32)
        path = tmp_path / "m.mat"
        kaldi_io.write_kaldi_object(
            lambda s, b: io_funcs.write_matrix(s, b, m), str(path))
        got = kaldi_io.read_kaldi_object(io_funcs.read_matrix, str(path))
        np.testing.assert_array_equal(got, m)


class TestTableFuzz:
    """Round-trip fuzz: odd shapes, odd keys, mixed holders."""

    def test_odd_matrices_and_keys(self, tmp_path):
        from kaldi_tpu.util.table import (SequentialTableReader,
                                          TableWriter)
        rng = np.random.default_rng(0)
        cases = {
            "a": rng.normal(size=(1, 1)).astype(np.float32),
            "key.with-punct_99": rng.normal(size=(3, 257)).astype(
                np.float32),
            "z" * 100: rng.normal(size=(500, 13)).astype(np.float32),
            "tiny": np.zeros((1, 2), np.float32),
        }
        path = f"ark,scp:{tmp_path}/t.ark,{tmp_path}/t.scp"
        with TableWriter("matrix", path) as w:
            for k in sorted(cases):
                w.write(k, cases[k])
        got = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/t.ark"))
        assert set(got) == set(cases)
        for k in cases:
            np.testing.assert_allclose(got[k], cases[k], atol=1e-6)
        # scp random access too
        from kaldi_tpu.util.table import RandomAccessTableReader
        ra = RandomAccessTableReader("matrix", f"scp:{tmp_path}/t.scp")
        np.testing.assert_allclose(ra["z" * 100], cases["z" * 100],
                                   atol=1e-6)

    def test_empty_int_vector_and_large_values(self, tmp_path):
        from kaldi_tpu.util.table import (SequentialTableReader,
                                          TableWriter)
        with TableWriter("int-vector", f"ark:{tmp_path}/i.ark") as w:
            w.write("empty", [])
            w.write("big", [2 ** 30, 0, -5])
        got = dict(SequentialTableReader("int-vector",
                                         f"ark:{tmp_path}/i.ark"))
        assert list(got["empty"]) == []
        assert list(got["big"]) == [2 ** 30, 0, -5]
