from kaldi_tpu.nnet2.model import (AmNnet2, Nnet2,  # noqa: F401
                                   read_nnet2_am, read_raw_nnet2,
                                   write_nnet2_am, write_raw_nnet2)
from kaldi_tpu.nnet2.egs import (DiscriminativeNnetExample,  # noqa: F401
                                 NnetExample, extract_egs)
