from kaldi_tpu.sgmm2.am_sgmm2 import (  # noqa: F401
    AmSgmm2,
    MleAmSgmm2Accs,
    MleSgmm2SpeakerAccs,
    Sgmm2Options,
    estimate_speaker_vectors,
    train_sgmm2,
)
