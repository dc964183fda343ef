from kaldi_tpu.lm.arpa import ArpaLm, parse_arpa, arpa_to_fst  # noqa: F401
