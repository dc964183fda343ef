from kaldi_tpu.tree.event_map import (  # noqa: F401
    ConstantEventMap,
    EventMap,
    SplitEventMap,
    TableEventMap,
    PDF_CLASS_KEY,
)
from kaldi_tpu.tree.context_dep import (  # noqa: F401
    ContextDependency,
    monophone_context_dependency,
    monophone_context_dependency_shared,
)
