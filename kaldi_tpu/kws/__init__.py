from kaldi_tpu.kws.index import KwsIndex, KwsHit  # noqa: F401
from kaldi_tpu.kws.factor_index import FactorIndex  # noqa: F401


def _read_any_index(rxfilename: str):
    """Read either index format by peeking the header token
    (<KwsIndex> posting lists / <KwsFactorIndex> factor transducer)."""
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.util import kaldi_io

    def _read(stream, binary):
        pos = stream.tell()
        tok = iof.read_token(stream, binary)
        stream.seek(pos)
        if tok == "<KwsFactorIndex>":
            return FactorIndex.read(stream, binary)
        return KwsIndex.read(stream, binary)

    return kaldi_io.read_kaldi_object(_read, rxfilename)
