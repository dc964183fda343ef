"""nnet1 (Karel's DNN) model format and training — reference src/nnet.

The compute path of this framework is the nnet3/jax stack; this module
provides full format parity so existing nnet1 recipes and models work:
reading/writing `<Nnet>` streams, prototype initialization, forward
propagation, and SGD backprop for the frame-shuffled trainers.
"""

from kaldi_tpu.nnet1.nnet import (Nnet, Component,
                                  component_from_proto_line,
                                  nnet_from_proto)
