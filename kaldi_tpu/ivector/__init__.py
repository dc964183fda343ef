from kaldi_tpu.ivector.extractor import (  # noqa: F401
    IvectorExtractor,
    IvectorExtractorOptions,
    IvectorExtractorStats,
    OnlineIvectorEstimationStats,
    train_ivector_extractor,
)
from kaldi_tpu.ivector.plda import Plda, train_plda  # noqa: F401
from kaldi_tpu.ivector.vad import VadEnergyOptions, compute_vad_energy  # noqa: F401
