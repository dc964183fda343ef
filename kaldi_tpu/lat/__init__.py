from kaldi_tpu.lat.kaldi_lattice import (  # noqa: F401
    Lattice,
    CompactLattice,
    LatticeHolder,
    CompactLatticeHolder,
    lattice_to_compact,
    compact_to_lattice,
)
from kaldi_tpu.lat.functions import (  # noqa: F401
    lattice_best_path,
    lattice_scale,
    lattice_prune,
    lattice_state_times,
    lattice_forward_backward_post,
    lattice_nbest,
    add_word_ins_penalty,
    determinize_lattice,
)
