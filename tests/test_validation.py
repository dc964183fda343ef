"""Data/lang-dir validation (parity: utils/validate_data_dir.sh,
validate_lang.pl, fix_data_dir.sh)."""

import os

import pytest

from kaldi_tpu.util.validation import (fix_data_dir, validate_data_dir,
                                       validate_lang_dir)


def _write(d, name, lines):
    with open(os.path.join(d, name), "w") as f:
        for line in lines:
            f.write(line + "\n")


@pytest.fixture
def good_dir(tmp_path):
    d = str(tmp_path)
    _write(d, "wav.scp", ["u1 /a/u1.wav", "u2 /a/u2.wav"])
    _write(d, "text", ["u1 YES NO", "u2 NO"])
    _write(d, "utt2spk", ["u1 s1", "u2 s2"])
    _write(d, "spk2utt", ["s1 u1", "s2 u2"])
    return d


class TestDataDir:
    def test_valid(self, good_dir):
        assert validate_data_dir(good_dir) == []

    def test_unsorted(self, good_dir):
        _write(good_dir, "utt2spk", ["u2 s2", "u1 s1"])
        _write(good_dir, "spk2utt", ["s1 u1", "s2 u2"])
        probs = validate_data_dir(good_dir)
        assert any("not sorted" in p for p in probs)

    def test_duplicate_key(self, good_dir):
        _write(good_dir, "text", ["u1 YES", "u1 NO", "u2 NO"])
        probs = validate_data_dir(good_dir)
        assert any("duplicate" in p for p in probs)

    def test_mismatched_utts(self, good_dir):
        _write(good_dir, "text", ["u1 YES"])
        probs = validate_data_dir(good_dir)
        assert any("mismatch" in p for p in probs)

    def test_bad_spk2utt(self, good_dir):
        _write(good_dir, "spk2utt", ["s1 u1 u2"])
        probs = validate_data_dir(good_dir)
        assert any("inverse" in p for p in probs)

    def test_segments(self, good_dir):
        _write(good_dir, "segments", ["u1 rec1 0.0 1.5", "u2 rec1 1.5 1.0"])
        _write(good_dir, "wav.scp", ["rec1 /a/rec1.wav"])
        probs = validate_data_dir(good_dir)
        assert any("bad times" in p for p in probs)

    def test_fix_removes_inconsistent(self, good_dir):
        _write(good_dir, "text", ["u1 YES NO", "u2 NO", "u3 YES"])
        removed = fix_data_dir(good_dir)
        assert removed == 1
        assert validate_data_dir(good_dir) == []
        with open(os.path.join(good_dir, "text")) as f:
            assert len(f.readlines()) == 2


class TestLangDir:
    def test_valid_and_corrupted(self, tmp_path):
        from kaldi_tpu.decoder.lang_dir import prepare_lang
        lex = tmp_path / "lexicon.txt"
        lex.write_text("YES Y\nNO N\n")
        lang = str(tmp_path / "lang")
        prepare_lang(str(lex), lang, sil_phone="SIL")
        assert validate_lang_dir(lang) == []
        # corrupt: phones.txt with duplicate id
        with open(os.path.join(lang, "phones.txt"), "a") as f:
            f.write("FAKE 1\n")
        probs = validate_lang_dir(lang)
        assert any("duplicate ids" in p for p in probs)

    def test_missing_files(self, tmp_path):
        probs = validate_lang_dir(str(tmp_path))
        assert any("missing" in p for p in probs)
