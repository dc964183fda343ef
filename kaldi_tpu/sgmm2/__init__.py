from kaldi_tpu.sgmm2.am_sgmm2 import (  # noqa: F401
    AmSgmm2,
    MleAmSgmm2Accs,
    Sgmm2Options,
    train_sgmm2,
)
