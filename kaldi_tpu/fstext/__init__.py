from kaldi_tpu.fstext.fst import (  # noqa: F401
    Arc,
    VectorFst,
    TropicalWeight,
    LogWeight,
    LatticeWeight,
    EPS,
)
from kaldi_tpu.fstext.ops import (  # noqa: F401
    arcsort,
    connect,
    compose,
    determinize_star,
    minimize_encoded,
    remove_eps_local,
    rm_epsilon,
    shortest_path,
    shortest_distance,
    project,
    invert,
    relabel,
    equal_paths,
    replace_fst,
)
