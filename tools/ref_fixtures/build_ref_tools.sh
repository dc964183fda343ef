#!/bin/bash
# Build a handful of fst-free reference binaries for golden-fixture
# generation: gmm-init-mono, gmm-copy, copy-tree, copy-feats.
set -e
SRC=/root/reference/src
OUT=/tmp/refbuild
mkdir -p $OUT/fstub/fst $OUT/bin $OUT/obj
# stub fst-decl.h: only forward declarations are needed
cat > $OUT/fstub/fst/fst-decl.h <<'EOH'
// stub of OpenFst's fst/fst-decl.h: forward declarations only (the
// built binaries never touch fst code paths)
#ifndef FST_FST_DECL_STUB_H_
#define FST_FST_DECL_STUB_H_
namespace fst {
template <class W> class ArcTpl;
class TropicalWeightTpl_dummy;
template <class A> class Fst;
template <class A> class MutableFst;
template <class A> class VectorFst;
template <class A> class ExpandedFst;
class SymbolTable;
template <class T> class FloatWeightTpl;
template <class T> class TropicalWeightTpl;
template <class T> class LogWeightTpl;
typedef TropicalWeightTpl<float> TropicalWeight;
typedef LogWeightTpl<float> LogWeight;
typedef ArcTpl<TropicalWeight> StdArc;
typedef Fst<StdArc> StdFst;
typedef VectorFst<StdArc> StdVectorFst;
}
#endif
EOH
mkdir -p $OUT/fstub/base
cat > $OUT/fstub/base/version.h <<'EOH'
#define KALDI_VERSION "5.5-fixture"
EOH
FLAGS="-std=c++17 -O1 -DHAVE_CLAPACK -I$SRC -I$OUT/fstub -I/root/reference/tools/CLAPACK -DKALDI_DOUBLEPRECISION=0 -Wno-deprecated-declarations -w -pthread"
CC_FILES="
base/kaldi-error.cc base/kaldi-math.cc base/kaldi-utils.cc base/io-funcs.cc base/timer.cc
matrix/kaldi-matrix.cc matrix/kaldi-vector.cc matrix/packed-matrix.cc matrix/sp-matrix.cc
matrix/tp-matrix.cc matrix/matrix-functions.cc matrix/qr.cc matrix/srfft.cc
matrix/compressed-matrix.cc matrix/sparse-matrix.cc matrix/optimization.cc
util/kaldi-io.cc util/kaldi-holder.cc util/kaldi-table.cc util/text-utils.cc
util/parse-options.cc util/simple-options.cc util/kaldi-semaphore.cc util/kaldi-thread.cc
tree/event-map.cc tree/context-dep.cc tree/clusterable-classes.cc tree/cluster-utils.cc
tree/build-tree.cc tree/build-tree-questions.cc tree/build-tree-utils.cc
gmm/diag-gmm.cc gmm/diag-gmm-normal.cc gmm/full-gmm.cc gmm/full-gmm-normal.cc
gmm/am-diag-gmm.cc gmm/mle-diag-gmm.cc gmm/mle-full-gmm.cc gmm/mle-am-diag-gmm.cc
gmm/model-common.cc
hmm/hmm-topology.cc hmm/transition-model.cc hmm/posterior.cc
feat/feature-functions.cc feat/feature-window.cc feat/feature-mfcc.cc
feat/feature-fbank.cc feat/feature-plp.cc feat/feature-spectrogram.cc
feat/mel-computations.cc feat/wave-reader.cc feat/pitch-functions.cc
feat/resample.cc feat/signal.cc feat/online-feature.cc
transform/cmvn.cc
"
for f in $CC_FILES; do
  o=$OUT/obj/$(echo $f | tr / _ | sed s/.cc$/.o/)
  if [ ! -f $o ] || [ $SRC/$f -nt $o ]; then
    echo "CC $f"; g++ $FLAGS -c $SRC/$f -o $o &
    while [ $(jobs -r | wc -l) -ge 8 ]; do wait -n; done
  fi
done
wait
LIBS="/lib/x86_64-linux-gnu/liblapack.so.3 /lib/x86_64-linux-gnu/libblas.so.3 -lm -lpthread"
for b in gmmbin/gmm-init-mono gmmbin/gmm-copy bin/copy-tree featbin/copy-feats featbin/copy-matrix featbin/compute-mfcc-feats featbin/compute-fbank-feats featbin/compute-kaldi-pitch-feats featbin/process-kaldi-pitch-feats; do
  n=$(basename $b)
  [ -f $SRC/$b.cc ] || continue
  echo "LD $n"
  g++ $FLAGS $SRC/$b.cc $OUT/obj/*.o $LIBS -o $OUT/bin/$n
done
echo BUILD-OK
