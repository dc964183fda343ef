import time, numpy as np
from kaldi_tpu.decoder.graph_direct import DirectGraphSpec, synth_bigram, synth_lexicon
from kaldi_tpu.decoder.block_chain import BlockChainDecoder, BlockChainGraph

V, B, T = 700, 64, 167
spec = DirectGraphSpec(vocab=V)
g = BlockChainGraph.build(synth_lexicon(spec), synth_bigram(spec), num_pdfs=spec.num_pdfs)
dec = BlockChainDecoder(g)
rng = np.random.default_rng(0)
ll = rng.normal(size=(B, T, spec.num_pdfs)).astype(np.float32)
t0=time.time()
lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0, lattice_beam=8.0)
print(f"warmup(+compile) {time.time()-t0:.1f}s ok={sum(l is not None for l in lats)}", flush=True)
t0=time.time()
lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0, lattice_beam=8.0)
dt=time.time()-t0
audio = B*T*0.03
ns = [l.num_states for l in lats if l is not None]
print(f"lattice decode: {dt:.2f}s for {audio:.0f}s audio -> {audio/dt:.0f}x RT; lattice states min/med/max {min(ns)}/{sorted(ns)[len(ns)//2]}/{max(ns)}")
