from kaldi_tpu.transform.lda import LdaEstimate, LdaOptions  # noqa: F401
from kaldi_tpu.transform.mllt import MlltAccs  # noqa: F401
from kaldi_tpu.transform.fmllr import (  # noqa: F401
    FmllrDiagGmmAccs,
    estimate_fmllr,
    apply_affine_transform,
)
from kaldi_tpu.transform.basis_fmllr import (  # noqa: F401
    BasisFmllrAccus,
    BasisFmllrEstimate,
)
from kaldi_tpu.transform.lvtln import (  # noqa: F401
    LinearVtln,
    train_lvtln,
)
from kaldi_tpu.transform.regtree_fmllr import (  # noqa: F401
    RegressionTree,
    RegtreeFmllr,
    RegtreeFmllrAccs,
    estimate_regtree_fmllr,
    regtree_log_likes,
)
from kaldi_tpu.transform.fmpe import (  # noqa: F401
    Fmpe,
    FmpeOptions,
    train_fmpe,
)
