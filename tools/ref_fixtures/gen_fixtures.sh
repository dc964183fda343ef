set -e
BIN=/tmp/refbuild/bin
OUT=/root/repo/tests/data/ref_golden
mkdir -p $OUT /tmp/fix
# topo: standard 3-state phones 1-4, 5-state silence phone 5 (the
# prepare_lang.sh shape)
cat > $OUT/topo <<'EOT'
<Topology>
<TopologyEntry>
<ForPhones>
1 2 3 4
</ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.75 <Transition> 1 0.25 </State>
<State> 1 <PdfClass> 1 <Transition> 1 0.75 <Transition> 2 0.25 </State>
<State> 2 <PdfClass> 2 <Transition> 2 0.75 <Transition> 3 0.25 </State>
<State> 3 </State>
</TopologyEntry>
<TopologyEntry>
<ForPhones>
5
</ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.5 <Transition> 1 0.5 </State>
<State> 1 <PdfClass> 1 <Transition> 1 0.5 <Transition> 2 0.5 </State>
<State> 2 <PdfClass> 2 <Transition> 2 0.5 <Transition> 3 0.5 </State>
<State> 3 </State>
</TopologyEntry>
</Topology>
EOT
# deterministic training feats via our own writer (text ark is
# trivially correct); the reference sets global mean/var from them
python3 - <<'EOP'
import numpy as np
rng = np.random.default_rng(42)
with open("/tmp/fix/train.ark", "w") as f:
    for i in range(3):
        m = rng.normal(size=(20, 13)) * 2.0 + i
        f.write(f"utt{i}  [\n")
        for r in m:
            f.write("  " + " ".join(f"{x:.6f}" for x in r) + "\n")
        f.write("]\n")
EOP
$BIN/gmm-init-mono --binary=true --train-feats=ark,t:/tmp/fix/train.ark $OUT/topo 13 $OUT/mono.mdl $OUT/mono.tree
$BIN/gmm-init-mono --binary=false --train-feats=ark,t:/tmp/fix/train.ark $OUT/topo 13 $OUT/mono_text.mdl /dev/null
$BIN/copy-tree --binary=false $OUT/mono.tree $OUT/mono_text.tree
# reference-written feature archives (binary ark + scp) from the text ark
$BIN/copy-feats --compress=false ark,t:/tmp/fix/train.ark ark,scp:$OUT/feats.ark,$OUT/feats.scp
$BIN/copy-feats --compress=true --compression-method=2 ark,t:/tmp/fix/train.ark ark:$OUT/feats_cm2.ark
sed -i "s|$OUT/|tests/data/ref_golden/|" $OUT/feats.scp
ls -la $OUT

# ---- feature goldens on real speech (src/feat/test_data/test.wav) ----
WAV=/root/reference/src/feat/test_data/test.wav
echo "tst $WAV" > /tmp/fix/wav.scp
$BIN/compute-mfcc-feats --dither=0.0 scp:/tmp/fix/wav.scp \
  ark:$OUT/mfcc.ark
$BIN/compute-fbank-feats --dither=0.0 scp:/tmp/fix/wav.scp \
  ark:$OUT/fbank.ark
$BIN/compute-kaldi-pitch-feats scp:/tmp/fix/wav.scp \
  ark:$OUT/pitch.ark
$BIN/compute-kaldi-pitch-feats --simulate-first-pass-online=true \
  --frames-per-chunk=10 scp:/tmp/fix/wav.scp \
  ark:$OUT/pitch_online.ark
$BIN/compute-kaldi-pitch-feats scp:/tmp/fix/wav.scp ark:- | \
  $BIN/process-kaldi-pitch-feats ark:- ark:$OUT/pitch_processed.ark
ls -la $OUT

# ---- nnet3 goldens: reference nnet3-init / nnet3-copy / nnet3-compute ----
# a TDNN-ish raw config exercising descriptors (Append/Offset), natural-
# gradient affine, ReLU, batchnorm, log-softmax
cat > /tmp/fix/tdnn.config <<'EOT'
component name=affine1 type=NaturalGradientAffineComponent input-dim=39 output-dim=16 param-stddev=0.1 bias-stddev=0.1
component name=relu1 type=RectifiedLinearComponent dim=16
component name=bn1 type=NormalizeComponent dim=16
component name=affine2 type=NaturalGradientAffineComponent input-dim=48 output-dim=12 param-stddev=0.1 bias-stddev=0.1
component name=logsoftmax type=LogSoftmaxComponent dim=12
input-node name=input dim=13
component-node name=affine1_node component=affine1 input=Append(Offset(input,-1), input, Offset(input,1))
component-node name=relu1_node component=relu1 input=affine1_node
component-node name=bn1_node component=bn1 input=relu1_node
component-node name=affine2_node component=affine2 input=Append(Offset(bn1_node,-1), bn1_node, Offset(bn1_node,1))
component-node name=logsoftmax_node component=logsoftmax input=affine2_node
output-node name=output input=logsoftmax_node
EOT
$BIN/nnet3-init --binary=true --srand=7 /tmp/fix/tdnn.config $OUT/tdnn.raw
$BIN/nnet3-init --binary=false --srand=7 /tmp/fix/tdnn.config $OUT/tdnn_text.raw
$BIN/nnet3-info $OUT/tdnn.raw > $OUT/tdnn.info
# forward golden: reference computes output on the golden feats
$BIN/nnet3-compute --use-gpu=no $OUT/tdnn.raw ark:$OUT/feats.ark \
  ark:$OUT/tdnn_out.ark
ls -la $OUT
