from kaldi_tpu.hmm.topology import HmmTopology, NO_PDF  # noqa: F401
from kaldi_tpu.hmm.transition_model import TransitionModel  # noqa: F401
