from kaldi_tpu.base.logging import (  # noqa: F401
    get_verbose_level,
    set_verbose_level,
    log,
    vlog,
    warn,
    error,
    KaldiTpuError,
)
