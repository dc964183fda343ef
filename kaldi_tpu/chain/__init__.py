from kaldi_tpu.chain.graphs import DenominatorGraph, PackedGraph  # noqa: F401
from kaldi_tpu.chain.objective import (  # noqa: F401
    ChainTrainingOptions,
    chain_objf_and_grad,
)
from kaldi_tpu.chain.supervision import (  # noqa: F401
    alignment_to_numerator_graph,
    estimate_phone_lm,
    make_denominator_graph,
)
