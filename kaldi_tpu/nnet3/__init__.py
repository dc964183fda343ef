from kaldi_tpu.nnet3.components import (  # noqa: F401
    TdnnfLayer,
    LstmpLayer,
    StatisticsPooling,
    constrain_orthonormal,
)
from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig  # noqa: F401
