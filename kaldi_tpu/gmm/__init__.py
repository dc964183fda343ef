from kaldi_tpu.gmm.diag_gmm import DiagGmm  # noqa: F401
from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm  # noqa: F401
from kaldi_tpu.gmm.mle import (  # noqa: F401
    AccumAmDiagGmm,
    AccumDiagGmm,
    MleDiagGmmOptions,
    mle_am_diag_gmm_update,
)
from kaldi_tpu.gmm.ebw import (  # noqa: F401
    EbwOptions,
    ismooth_stats_diag_gmm,
    update_ebw_am_diag_gmm,
    update_ebw_diag_gmm,
    update_ebw_weights_diag_gmm,
)
from kaldi_tpu.gmm.full_gmm import (  # noqa: F401
    AccumFullGmm,
    FullGmm,
    MleFullGmmOptions,
    mle_full_gmm_update,
)
