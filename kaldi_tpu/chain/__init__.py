from kaldi_tpu.chain.graphs import DenominatorGraph, PackedGraph  # noqa: F401
from kaldi_tpu.chain.objective import (  # noqa: F401
    ChainTrainingOptions,
    chain_objf_and_grad,
)
from kaldi_tpu.chain.supervision import (  # noqa: F401
    alignment_to_numerator_graph,
    alignment_to_phone_segments,
    alignment_to_tolerance_numerator,
    estimate_phone_lm,
    lattice_to_tolerance_numerator,
    make_denominator_graph,
    make_tolerance_supervision,
    union_graphs,
)
