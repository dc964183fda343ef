from kaldi_tpu.nnet3.components import (  # noqa: F401
    TdnnfLayer,
    LstmpLayer,
    StatisticsPooling,
    constrain_orthonormal,
)
from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig  # noqa: F401
from kaldi_tpu.nnet3.mdl_io import (  # noqa: F401
    Nnet3Graph,
    chain_tdnnf_to_nnet3,
    parse_descriptor,
    read_nnet3_am,
    read_raw_nnet3,
    write_nnet3_am,
    write_raw_nnet3,
)
