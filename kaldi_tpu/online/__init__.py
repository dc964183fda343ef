from kaldi_tpu.online.features import (  # noqa: F401
    OnlineFeature,
    OnlineCmvn,
    OnlineCmvnOptions,
    OnlineCmvnState,
    OnlineSpliceFrames,
    OnlineDeltaFeature,
    OnlineAppendFeature,
    OnlineFeaturePipeline,
)
from kaldi_tpu.online.decoding import (  # noqa: F401
    OnlineFasterDecoder,
    EndpointRule,
    OnlineEndpointConfig,
    endpoint_detected,
    SingleUtteranceDecoder,
)
