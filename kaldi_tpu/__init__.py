"""kaldi_tpu — a TPU-native speech recognition framework.

A ground-up re-design of the capabilities of kaldi-asr/kaldi for TPU
hardware: JAX/XLA/Pallas for all numeric compute (batched, jitted,
MXU-friendly), pjit/shard_map over device meshes for scale-out, and a
thin host layer for symbolic work (WFSTs, trees, lexicons) plus
Kaldi-compatible ark/scp table I/O so that reference recipes, models
and data directories interoperate.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  base/      logging, binary/text object I/O primitives
  util/      extended-filename I/O, ark/scp tables, CLI option parsing
  matrix/    host-side codecs (compressed matrix); device math is jnp
  feat/      batched feature frontend (MFCC/fbank/PLP/pitch), CMVN,
             deltas, splicing, resampling — single fused jitted programs
  gmm/       diagonal GMM acoustic models; likelihoods as batched matmuls
  tree/      phonetic-context decision trees (EventMap)
  hmm/       HMM topologies, transition model, H transducer
  fstext/    WFST core: semirings, compose, determinize, minimize
  lat/       lattices and lattice algorithms
  decoder/   CPU lattice decoder + TPU batched Viterbi
  nnet3/     acoustic model zoo (TDNN-F, LSTM, ...) as functional JAX
  chain/     LF-MMI (chain) objective: denominator/numerator FB kernels
  lm/        ARPA n-gram parsing, G compilation, const-ARPA rescoring
  ivector/   i-vector extraction, PLDA, VAD
  online/    streaming feature pipeline + online decoding
  ops/       Pallas kernels and low-level device ops
  parallel/  mesh/sharding utilities, data-parallel training step
  cli/       Kaldi-compatible command-line tools
"""

__version__ = "0.1.0"
