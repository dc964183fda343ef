from kaldi_tpu.feat.window import FrameExtractionOptions, num_frames  # noqa: F401
from kaldi_tpu.feat.mel import MelBanksOptions, mel_banks_matrix  # noqa: F401
from kaldi_tpu.feat.frontend import (  # noqa: F401
    MfccOptions,
    FbankOptions,
    SpectrogramOptions,
    OfflineFeature,
)
from kaldi_tpu.feat.plp import PlpOptions  # noqa: F401
