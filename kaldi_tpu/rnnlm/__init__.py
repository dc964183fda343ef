from kaldi_tpu.rnnlm.model import (  # noqa: F401
    RnnLm,
    RnnLmConfig,
    train_rnnlm,
    sentence_logprob,
)
from kaldi_tpu.rnnlm.rescore import (  # noqa: F401
    RnnLmDeterministic,
    rnnlm_rescore_nbest,
)
