from kaldi_tpu.kws.index import KwsIndex, KwsHit  # noqa: F401
