from kaldi_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    batch_sharding,
)
from kaldi_tpu.parallel.trainer import (  # noqa: F401
    ChainTrainState,
    make_chain_train_state,
    make_sharded_train_step,
)
