from kaldi_tpu.util.kaldi_io import open_input, open_output  # noqa: F401
from kaldi_tpu.util.table import (  # noqa: F401
    SequentialTableReader,
    RandomAccessTableReader,
    TableWriter,
)
from kaldi_tpu.util.parse_options import ParseOptions  # noqa: F401
