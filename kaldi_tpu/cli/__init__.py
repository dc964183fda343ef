"""Kaldi-compatible command-line tools.

Each tool mirrors a reference binary (SURVEY.md §2.11): same positional
arguments, option names, and table specifiers, so recipe scripts can
invoke `kaldi-tpu <tool> ...` (or `python -m kaldi_tpu.cli <tool>`)
where they would invoke the reference binary.
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict, List, Tuple

# tool-name -> (module path, function name)
TOOLS: Dict[str, Tuple[str, str]] = {}


def _register(module: str, mapping: Dict[str, str]) -> None:
    for tool, func in mapping.items():
        TOOLS[tool] = (module, func)


_register("kaldi_tpu.cli.feat_tools", {
    "compute-mfcc-feats": "compute_mfcc_feats",
    "compute-fbank-feats": "compute_fbank_feats",
    "compute-spectrogram-feats": "compute_spectrogram_feats",
    "compute-plp-feats": "compute_plp_feats",
    "copy-feats": "copy_feats",
    "copy-matrix": "copy_matrix",
    "compute-cmvn-stats": "compute_cmvn_stats",
    "apply-cmvn": "apply_cmvn",
    "apply-cmvn-sliding": "apply_cmvn_sliding",
    "add-deltas": "add_deltas",
    "splice-feats": "splice_feats",
    "paste-feats": "paste_feats",
    "select-feats": "select_feats",
    "subset-feats": "subset_feats",
    "feat-to-dim": "feat_to_dim",
    "feat-to-len": "feat_to_len",
    "wav-to-duration": "wav_to_duration",
    "extract-segments": "extract_segments",
    "matrix-sum": "matrix_sum",
    "vector-sum": "vector_sum",
    "shift-feats": "shift_feats",
    "subsample-feats": "subsample_feats",
    "concat-feats": "concat_feats",
    "compare-feats": "compare_feats",
    "append-vector-to-feats": "append_vector_to_feats",
    "post-to-feats": "post_to_feats",
    "wav-copy": "wav_copy",
    "extract-feature-segments": "extract_feature_segments",
    "compute-kaldi-pitch-feats": "compute_kaldi_pitch_feats",
    "process-kaldi-pitch-feats": "process_kaldi_pitch_feats",
    "modify-cmvn-stats": "modify_cmvn_stats",
    "interpolate-pitch": "interpolate_pitch",
    "compose-transforms": "compose_transforms",
})

_register("kaldi_tpu.cli.gmm_tools", {
    "gmm-init-mono": "gmm_init_mono",
    "compile-train-graphs": "compile_train_graphs",
    "gmm-align-compiled": "gmm_align_compiled",
    "gmm-acc-stats-ali": "gmm_acc_stats_ali",
    "gmm-sum-accs": "gmm_sum_accs",
    "gmm-est": "gmm_est",
    "gmm-latgen-faster": "gmm_latgen_faster",
    "gmm-info": "gmm_info",
    "gmm-est-gaussians-ebw": "gmm_est_gaussians_ebw",
    "gmm-est-weights-ebw": "gmm_est_weights_ebw",
    "gmm-ismooth-stats": "gmm_ismooth_stats",
    "latgen-faster-mapped": "latgen_faster_mapped",
    "gmm-global-init-from-feats": "gmm_global_init_from_feats",
    "gmm-global-acc-stats": "gmm_global_acc_stats",
    "gmm-global-est": "gmm_global_est",
    "gmm-global-to-fgmm": "gmm_global_to_fgmm",
    "fgmm-global-acc-stats": "fgmm_global_acc_stats",
    "fgmm-global-est": "fgmm_global_est",
})

_register("kaldi_tpu.cli.ali_tools", {
    "align-equal-compiled": "align_equal_compiled",
    "ali-to-phones": "ali_to_phones",
    "ali-to-pdf": "ali_to_pdf",
    "copy-int-vector": "copy_int_vector",
    "compute-wer": "compute_wer",
    "align-text": "align_text",
    "ali-to-post": "ali_to_post",
    "weight-silence-post": "weight_silence_post",
    "post-to-weights": "post_to_weights",
    "show-alignments": "show_alignments",
})

_register("kaldi_tpu.cli.misc_tools", {
    "transform-feats": "transform_feats",
    "est-lda": "est_lda",
    "acc-lda": "acc_lda",
    "gmm-est-fmllr": "gmm_est_fmllr",
    "compute-vad": "compute_vad",
    "ivector-extract": "ivector_extract",
    "ivector-compute-plda": "ivector_compute_plda",
    "lattice-lmrescore": "lattice_lmrescore_cli",
    "lattice-mbr-decode": "lattice_mbr_decode",
    "lattice-to-ctm-conf": "lattice_to_ctm_conf",
    "nnet3-init": "nnet3_init",
    "nnet3-compute": "nnet3_compute",
    "copy-vector": "copy_vector",
    "gmm-boost-silence": "gmm_boost_silence",
    "tree-info": "tree_info",
    "am-info": "am_info",
    "lattice-depth": "lattice_depth",
    "lattice-oracle": "lattice_oracle",
    "wav-reverberate": "wav_reverberate",
    "nnet3-xvector-compute": "nnet3_xvector_compute",
    "prepare-lang": "prepare_lang",
    "fstpushspecial": "fstpushspecial",
    "nnet3-am-copy": "nnet3_am_copy",
    "validate-data-dir": "validate_data_dir_cli",
    "validate-lang": "validate_lang_cli",
    "fix-data-dir": "fix_data_dir_cli",
    "ivector-plda-scoring": "ivector_plda_scoring",
    "copy-feats-to-htk": "copy_feats_to_htk",
    "ivector-mean": "ivector_mean",
    "fstcompile": "fstcompile",
    "fstprint": "fstprint",
    "nnet3-info": "nnet3_info",
})

_register("kaldi_tpu.cli.nnet3_latgen_tools", {
    "nnet3-latgen-faster-looped": "nnet3_latgen_faster_looped",
    "nnet3-latgen-faster-looped-parallel":
        "nnet3_latgen_faster_looped_parallel",
    "nnet3-latgen-faster-batch": "nnet3_latgen_faster_batch",
    "nnet3-latgen-faster-lookahead": "nnet3_latgen_faster_lookahead",
})

_register("kaldi_tpu.cli.nnet3_tools", {
    "nnet3-latgen-faster": "nnet3_latgen_faster",
    "acc-tree-stats": "acc_tree_stats",
    "sum-tree-stats": "sum_tree_stats",
    "cluster-phones": "cluster_phones_cli",
    "build-tree": "build_tree_cli",
})

_register("kaldi_tpu.cli.online_tools", {
    "online2-wav-gmm-latgen-faster": "online2_wav_gmm_latgen_faster",
    "online2-wav-nnet3-latgen-faster": "online2_wav_nnet3_latgen_faster",
})

_register("kaldi_tpu.cli.lat_tools", {
    "lattice-copy": "lattice_copy",
    "lattice-scale": "lattice_scale_cli",
    "lattice-add-penalty": "lattice_add_penalty",
    "lattice-prune": "lattice_prune_cli",
    "lattice-determinize": "lattice_determinize_cli",
    "lattice-determinize-pruned": "lattice_determinize_pruned_cli",
    "lattice-best-path": "lattice_best_path_cli",
    "lattice-1best": "lattice_1best",
    "lattice-to-nbest": "lattice_to_nbest",
    "nbest-to-linear": "nbest_to_linear",
    "lattice-to-post": "lattice_to_post",
    "lattice-align-words": "lattice_align_words",
    "lattice-rmali": "lattice_rmali",
    "arpa-to-const-arpa": "arpa_to_const_arpa",
    "lattice-lmrescore-const-arpa": "lattice_lmrescore_const_arpa",
    "lattice-lmrescore-pruned": "lattice_lmrescore_pruned_cli",
})

_register("kaldi_tpu.cli.lat_tools2", {
    "lattice-to-mpe-post": "lattice_to_mpe_post",
    "lattice-to-smbr-post": "lattice_to_smbr_post",
    "lattice-union": "lattice_union",
    "lattice-reverse": "lattice_reverse",
    "lattice-project": "lattice_project",
    "lattice-to-fst": "lattice_to_fst_cli",
    "lattice-to-phone-lattice": "lattice_to_phone_lattice",
    "lattice-depth-per-frame": "lattice_depth_per_frame",
    "lattice-limit-depth": "lattice_limit_depth",
    "lattice-arc-post": "lattice_arc_post",
    "lattice-confidence": "lattice_confidence",
    "lattice-equivalent": "lattice_equivalent",
    "lattice-boost-ali": "lattice_boost_ali",
    "linear-to-nbest": "linear_to_nbest",
    "nbest-to-ctm": "nbest_to_ctm",
    "lattice-compose": "lattice_compose",
    "lattice-interp": "lattice_interp",
    "lattice-push": "lattice_push",
})

_register("kaldi_tpu.cli.tail3_tools", {
    "compute-eer": "compute_eer",
    "compute-wer-bootci": "compute_wer_bootci",
    "ivector-subtract-global-mean": "ivector_subtract_global_mean",
    "ivector-normalize-length": "ivector_normalize_length",
    "agglomerative-cluster": "agglomerative_cluster",
    "ivector-plda-scoring-dense": "ivector_plda_scoring_dense",
    "lattice-combine": "lattice_combine",
    "vector-scale": "vector_scale",
    "nnet3-discriminative-get-egs": "nnet3_discriminative_get_egs",
    "nnet3-discriminative-copy-egs": "nnet3_discriminative_copy_egs",
})

_register("kaldi_tpu.cli.chain_tools", {
    "chain-est-phone-lm": "chain_est_phone_lm",
    "chain-make-den-fst": "chain_make_den_fst",
    "chain-get-supervision": "chain_get_supervision",
    "nnet3-chain-get-egs": "nnet3_chain_get_egs",
    "nnet3-chain-e2e-get-egs": "nnet3_chain_e2e_get_egs",
    "nnet3-chain-copy-egs": "nnet3_chain_copy_egs",
    "nnet3-chain-shuffle-egs": "nnet3_chain_shuffle_egs",
    "nnet3-chain-subset-egs": "nnet3_chain_subset_egs",
    "nnet3-chain-merge-egs": "nnet3_chain_merge_egs",
    "nnet3-chain-normalize-egs": "nnet3_chain_normalize_egs",
    "nnet3-chain-compute-prob": "nnet3_chain_compute_prob",
    "nnet3-chain-train": "nnet3_chain_train",
    "nnet3-chain-combine": "nnet3_chain_combine",
})

_register("kaldi_tpu.cli.fst_tools", {
    "fstcopy": "fstcopy",
    "fstisstochastic": "fstisstochastic",
    "fstaddselfloops": "fstaddselfloops",
    "fstaddsubsequentialloop": "fstaddsubsequentialloop",
    "fstrmsymbols": "fstrmsymbols",
    "fstrmepslocal": "fstrmepslocal",
    "fstdeterminizestar": "fstdeterminizestar",
    "fstdeterminizelog": "fstdeterminizelog",
    "fstminimizeencoded": "fstminimizeencoded",
    "fsttablecompose": "fsttablecompose",
    "fstphicompose": "fstphicompose",
    "fstcomposecontext": "fstcomposecontext",
    "fsts-concat": "fsts_concat",
    "fsts-union": "fsts_union",
    "fsts-project": "fsts_project",
    "fsts-to-transcripts": "fsts_to_transcripts",
    "transcripts-to-fsts": "transcripts_to_fsts",
    "arpa2fst": "arpa2fst",
    "make-pdf-to-tid-transducer": "make_pdf_to_tid_transducer",
})

_register("kaldi_tpu.cli.tail4_tools", {
    "copy-post": "copy_post",
    "scale-post": "scale_post",
    "sum-post": "sum_post",
    "weight-post": "weight_post",
    "post-to-pdf-post": "post_to_pdf_post",
    "post-to-phone-post": "post_to_phone_post",
    "matrix-dim": "matrix_dim",
    "matrix-scale": "matrix_scale",
    "extract-rows": "extract_rows",
    "gmm-copy": "gmm_copy",
    "copy-transition-model": "copy_transition_model",
    "copy-tree": "copy_tree",
    "show-transitions": "show_transitions",
})

_register("kaldi_tpu.cli.latrnnlm_tools", {
    "lattice-add-nnlmscore": "lattice_add_nnlmscore",
    "lattice-lmrescore-rnnlm": "lattice_lmrescore_rnnlm",
    "lattice-lmrescore-kaldi-rnnlm-pruned":
        "lattice_lmrescore_kaldi_rnnlm_pruned",
    "phones-to-prons": "phones_to_prons",
    "prons-to-wordali": "prons_to_wordali",
    "generate-proxy-keywords": "generate_proxy_keywords",
    "print-proxy-keywords": "print_proxy_keywords",
    "ivector-extract-online2": "ivector_extract_online2",
})

_register("kaldi_tpu.cli.tree2_tools", {
    "compile-questions": "compile_questions",
    "build-tree-two-level": "build_tree_two_level",
    "gmm-init-biphone": "gmm_init_biphone",
    "fstmakecontextfst": "fstmakecontextfst",
    "fstmakecontextsyms": "fstmakecontextsyms",
    "make-ilabel-transducer": "make_ilabel_transducer",
    "compile-train-graphs-without-lexicon":
        "compile_train_graphs_without_lexicon",
})

_register("kaldi_tpu.cli.sgmm2_tools2", {
    "sgmm2-post-to-gpost": "sgmm2_post_to_gpost",
    "sgmm2-acc-stats-gpost": "sgmm2_acc_stats_gpost",
    "sgmm2-acc-stats2": "sgmm2_acc_stats2",
    "sgmm2-est-spkvecs-gpost": "sgmm2_est_spkvecs_gpost",
    "sgmm2-comp-prexform": "sgmm2_comp_prexform",
    "sgmm2-est-fmllr": "sgmm2_est_fmllr",
    "sgmm2-est-ebw": "sgmm2_est_ebw",
    "sgmm2-project": "sgmm2_project",
})

_register("kaldi_tpu.cli.fmpe2_tools", {
    "gmm-fmpe-acc-stats": "gmm_fmpe_acc_stats",
    "fmpe-acc-stats": "fmpe_acc_stats",
    "fmpe-sum-accs": "fmpe_sum_accs",
    "gmm-get-stats-deriv": "gmm_get_stats_deriv",
    "gmm-acc-stats-twofeats": "gmm_acc_stats_twofeats",
    "gmm-global-acc-stats-twofeats": "gmm_global_acc_stats_twofeats",
    "fgmm-global-merge": "fgmm_global_merge",
    "fgmm-global-init-from-accs": "fgmm_global_init_from_accs",
    "gmm-global-est-lvtln-trans": "gmm_global_est_lvtln_trans",
    "fstrand": "fstrand",
    "cuda-compiled": "cuda_compiled",
    "cuda-gpu-available": "cuda_gpu_available",
    "build-pfile-from-ali": "build_pfile_from_ali",
})

_register("kaldi_tpu.cli.decoders2_tools", {
    "gmm-decode-simple": "gmm_decode_simple",
    "gmm-latgen-simple": "gmm_latgen_simple",
    "gmm-decode-biglm-faster": "gmm_decode_biglm_faster",
    "gmm-latgen-biglm-faster": "gmm_latgen_biglm_faster",
    "gmm-latgen-map": "gmm_latgen_map",
    "latgen-incremental-mapped": "latgen_incremental_mapped",
})

_register("kaldi_tpu.cli.nnet3_tail2_tools", {
    "nnet3-train": "nnet3_train",
    "nnet3-combine": "nnet3_combine",
    "nnet3-chain-train2": "nnet3_chain_train2",
    "nnet3-chain-combine2": "nnet3_chain_combine2",
    "nnet3-am-train-transitions": "nnet3_am_train_transitions",
    "nnet3-acc-lda-stats": "nnet3_acc_lda_stats",
    "nnet3-chain-acc-lda-stats": "nnet3_chain_acc_lda_stats",
    "nnet3-get-egs-dense-targets": "nnet3_get_egs_dense_targets",
    "nnet3-get-egs-simple": "nnet3_get_egs_simple",
    "nnet3-discriminative-shuffle-egs":
        "nnet3_discriminative_shuffle_egs",
    "nnet3-discriminative-subset-egs":
        "nnet3_discriminative_subset_egs",
    "nnet3-discriminative-merge-egs":
        "nnet3_discriminative_merge_egs",
    "nnet3-discriminative-compute-objf":
        "nnet3_discriminative_compute_objf",
    "nnet3-discriminative-compute-from-egs":
        "nnet3_discriminative_compute_from_egs",
    "nnet3-chain-add-post-to-egs": "nnet3_chain_add_post_to_egs",
    "chain-make-num-fst-e2e": "chain_make_num_fst_e2e",
    "rnnlm-get-egs": "rnnlm_get_egs",
})

_register("kaldi_tpu.cli.latalign_tools", {
    "lattice-align-phones": "lattice_align_phones",
    "lattice-align-words-lexicon": "lattice_align_words_lexicon",
    "nbest-to-prons": "nbest_to_prons",
    "lattice-difference": "lattice_difference",
    "lattice-expand": "lattice_expand",
    "lattice-path-cover": "lattice_path_cover",
    "lattice-determinize-non-compact":
        "lattice_determinize_non_compact",
})

_register("kaldi_tpu.cli.mllt2_tools", {
    "gmm-acc-mllt-global": "gmm_acc_mllt_global",
    "sum-mllt-accs": "sum_mllt_accs",
    "get-full-lda-mat": "get_full_lda_mat",
    "gmm-est-rescale": "gmm_est_rescale",
    "init-ubm": "init_ubm",
})

_register("kaldi_tpu.cli.regtree2_tools", {
    "gmm-est-regtree-fmllr": "gmm_est_regtree_fmllr",
    "gmm-est-regtree-mllr": "gmm_est_regtree_mllr",
    "gmm-decode-faster-regtree-fmllr": "gmm_decode_faster_regtree_fmllr",
    "gmm-decode-faster-regtree-mllr": "gmm_decode_faster_regtree_mllr",
    "gmm-latgen-faster-regtree-fmllr": "gmm_latgen_faster_regtree_fmllr",
})

_register("kaldi_tpu.cli.transform2_tools", {
    "gmm-post-to-gpost": "gmm_post_to_gpost",
    "gmm-est-fmllr-gpost": "gmm_est_fmllr_gpost",
    "gmm-est-fmllr-global": "gmm_est_fmllr_global",
    "gmm-basis-fmllr-accs": "gmm_basis_fmllr_accs",
    "gmm-basis-fmllr-accs-gpost": "gmm_basis_fmllr_accs_gpost",
    "gmm-est-basis-fmllr-gpost": "gmm_est_basis_fmllr_gpost",
    "gmm-est-fmllr-raw": "gmm_est_fmllr_raw",
    "gmm-est-fmllr-raw-gpost": "gmm_est_fmllr_raw_gpost",
})

_register("kaldi_tpu.cli.parbin_tools", {
    "gmm-latgen-faster-parallel": "gmm_latgen_faster_parallel",
    "latgen-faster-mapped-parallel": "latgen_faster_mapped_parallel",
    "sgmm2-latgen-faster-parallel": "sgmm2_latgen_faster_parallel",
    "nnet3-latgen-faster-parallel": "nnet3_latgen_faster_parallel",
    "lattice-determinize-pruned-parallel":
        "lattice_determinize_pruned_parallel",
    "lattice-determinize-phone-pruned":
        "lattice_determinize_phone_pruned",
    "lattice-determinize-phone-pruned-parallel":
        "lattice_determinize_phone_pruned_parallel",
})

_register("kaldi_tpu.cli.tail14_tools", {
    "append-post-to-feats": "append_post_to_feats",
    "apply-cmvn-online": "apply_cmvn_online",
    "matrix-max": "matrix_max",
    "post-to-smat": "post_to_smat",
    "process-pitch-feats": "process_pitch_feats",
    "compute-cmvn-stats-two-channel": "compute_cmvn_stats_two_channel",
    "copy-feats-to-sphinx": "copy_feats_to_sphinx",
    "decode-faster": "decode_faster",
    "align-mapped": "align_mapped",
})

_register("kaldi_tpu.cli.tail13_tools", {
    "nnet3-am-init": "nnet3_am_init",
    "nnet3-am-adjust-priors": "nnet3_am_adjust_priors",
    "nnet3-show-progress": "nnet3_show_progress",
    "nnet3-chain-compute-post": "nnet3_chain_compute_post",
    "rnnlm-get-word-embedding": "rnnlm_get_word_embedding",
})

_register("kaldi_tpu.cli.tail12_tools", {
    "align-equal": "align_equal",
    "compile-train-graphs-fsts": "compile_train_graphs_fsts",
    "gmm-init-model-flat": "gmm_init_model_flat",
    "gmm-global-gselect-to-post": "gmm_global_gselect_to_post",
    "fgmm-global-gselect-to-post": "fgmm_global_gselect_to_post",
    "fgmm-global-acc-stats-post": "fgmm_global_acc_stats_post",
    "ivector-extractor-copy": "ivector_extractor_copy",
    "ivector-randomize": "ivector_randomize",
})

_register("kaldi_tpu.cli.tail11_tools", {
    "gmm-est-map": "gmm_est_map",
    "gmm-acc-stats": "gmm_acc_stats",
    "gmm-decode-faster": "gmm_decode_faster",
    "gmm-align": "gmm_align",
    "gmm-transform-means": "gmm_transform_means",
    "gmm-transform-means-global": "gmm_transform_means_global",
    "fgmm-global-get-frame-likes": "fgmm_global_get_frame_likes",
    "train-transitions": "train_transitions",
    "nnet3-am-info": "nnet3_am_info",
    "paste-post": "paste_post",
    "lattice-expand-ngram": "lattice_expand_ngram",
})

_register("kaldi_tpu.cli.tail10_tools", {
    "gmm-global-sum-accs": "gmm_global_sum_accs",
    "gmm-global-copy": "gmm_global_copy",
    "gmm-global-get-frame-likes": "gmm_global_get_frame_likes",
    "gmm-global-est-fmllr": "gmm_global_est_fmllr",
    "fgmm-global-sum-accs": "fgmm_global_sum_accs",
    "fgmm-global-to-gmm": "fgmm_global_to_gmm",
    "copy-gselect": "copy_gselect",
    "gmm-acc-stats2": "gmm_acc_stats2",
    "extend-transform-dim": "extend_transform_dim",
})

_register("kaldi_tpu.cli.tail9_tools", {
    "ivector-adapt-plda": "ivector_adapt_plda",
    "ivector-copy-plda": "ivector_copy_plda",
    "ivector-compute-dot-products": "ivector_compute_dot_products",
    "add-deltas-sdc": "add_deltas_sdc",
    "compute-and-process-kaldi-pitch-feats":
        "compute_and_process_kaldi_pitch_feats",
    "wav-perturb-speed": "wav_perturb_speed",
    "wav-perturb-volume": "wav_perturb_volume",
    "nnet3-discriminative-train": "nnet3_discriminative_train",
    "ivector-extract-online": "ivector_extract_online",
})

_register("kaldi_tpu.cli.tail8_tools", {
    "gmm-basis-fmllr-training": "gmm_basis_fmllr_training",
    "gmm-est-basis-fmllr": "gmm_est_basis_fmllr",
    "gmm-init-lvtln": "gmm_init_lvtln",
    "gmm-train-lvtln-special": "gmm_train_lvtln_special",
    "gmm-est-lvtln-trans": "gmm_est_lvtln_trans",
    "gmm-make-regtree": "gmm_make_regtree",
    "gmm-est-regtree-fmllr-ali": "gmm_est_regtree_fmllr_ali",
    "fmpe-init": "fmpe_init",
    "fmpe-est": "fmpe_est",
    "fmpe-apply-transform": "fmpe_apply_transform",
})

_register("kaldi_tpu.cli.tail7_tools", {
    "logistic-regression-train": "logistic_regression_train",
    "logistic-regression-eval": "logistic_regression_eval",
    "logistic-regression-copy": "logistic_regression_copy",
    "compute-gop": "compute_gop",
    "draw-tree": "draw_tree",
    "extend-wav-with-silence": "extend_wav_with_silence",
    "nnet3-xvector-get-egs": "nnet3_xvector_get_egs",
    "sum-lda-accs": "sum_lda_accs",
})

_register("kaldi_tpu.cli.online_tools2", {
    "online2-tcp-nnet3-decode-faster": "online2_tcp_nnet3_decode_faster",
    "online2-wav-dump-features": "online2_wav_dump_features",
})

_register("kaldi_tpu.cli.online_legacy_tools", {
    "online-wav-gmm-decode-faster": "online_wav_gmm_decode_faster",
    "online-audio-server-decode-faster":
        "online_audio_server_decode_faster",
    "online-audio-client": "online_audio_client",
    "online2-wav-nnet3-wake-word-decoder-faster":
        "online2_wav_nnet3_wake_word_decoder_faster",
})

_register("kaldi_tpu.cli.nnet2_tools", {
    "raw-nnet-info": "raw_nnet_info",
    "raw-nnet-copy": "raw_nnet_copy",
    "raw-nnet-concat": "raw_nnet_concat",
    "nnet-am-info": "nnet_am_info",
    "nnet-am-copy": "nnet_am_copy",
    "nnet-am-compute": "nnet_am_compute",
    "nnet-to-raw-nnet": "nnet_to_raw_nnet",
    "nnet1-to-raw-nnet": "nnet1_to_raw_nnet",
})

_register("kaldi_tpu.cli.nnet2_egs_tools", {
    "nnet-get-egs": "nnet_get_egs",
    "nnet-get-weighted-egs": "nnet_get_weighted_egs",
    "nnet-copy-egs": "nnet_copy_egs",
    "nnet-shuffle-egs": "nnet_shuffle_egs",
    "nnet-subset-egs": "nnet_subset_egs",
    "nnet-relabel-egs": "nnet_relabel_egs",
    "nnet-compute": "nnet_compute",
    "nnet-compute-from-egs": "nnet_compute_from_egs",
    "nnet-compute-prob": "nnet_compute_prob",
})

_register("kaldi_tpu.cli.nnet2_train_tools", {
    "nnet-init": "nnet_init",
    "nnet-am-init": "nnet_am_init",
    "nnet-train-simple": "nnet_train_simple",
    "nnet-train-parallel": "nnet_train_parallel",
    "nnet-train-ensemble": "nnet_train_ensemble",
    "nnet-train-transitions": "nnet_train_transitions",
    "nnet-combine": "nnet_combine",
    "nnet-combine-fast": "nnet_combine_fast",
    "nnet-am-average": "nnet_am_average",
    "nnet-modify-learning-rates": "nnet_modify_learning_rates",
    "nnet-adjust-priors": "nnet_adjust_priors",
    "nnet-show-progress": "nnet_show_progress",
})

_register("kaldi_tpu.cli.nnet2_surgery_tools", {
    "nnet-insert": "nnet_insert",
    "nnet-replace-last-layers": "nnet_replace_last_layers",
    "nnet-am-mixup": "nnet_am_mixup",
    "nnet-am-widen": "nnet_am_widen",
    "nnet-am-fix": "nnet_am_fix",
    "nnet-am-reinitialize": "nnet_am_reinitialize",
    "nnet-am-switch-preconditioning":
        "nnet_am_switch_preconditioning",
    "nnet-normalize-stddev": "nnet_normalize_stddev",
    "nnet-get-feature-transform": "nnet_get_feature_transform",
    "nnet-get-feature-transform-multi":
        "nnet_get_feature_transform_multi",
})

_register("kaldi_tpu.cli.nnet2_disc_tools", {
    "nnet-get-egs-discriminative": "nnet_get_egs_discriminative",
    "nnet-copy-egs-discriminative": "nnet_copy_egs_discriminative",
    "nnet-shuffle-egs-discriminative":
        "nnet_shuffle_egs_discriminative",
    "nnet-combine-egs-discriminative":
        "nnet_combine_egs_discriminative",
    "nnet-compare-hash-discriminative":
        "nnet_compare_hash_discriminative",
    "nnet-train-discriminative-simple":
        "nnet_train_discriminative_simple",
    "nnet-train-discriminative-parallel":
        "nnet_train_discriminative_parallel",
    "nnet-align-compiled": "nnet_align_compiled",
    "nnet-latgen-faster": "nnet_latgen_faster",
    "nnet-latgen-faster-parallel": "nnet_latgen_faster_parallel",
})

_register("kaldi_tpu.cli.online_tools2", {
    "align-compiled-mapped": "align_compiled_mapped",
    "nnet3-align-compiled": "nnet3_align_compiled",
})

_register("kaldi_tpu.cli.tail6_tools", {
    "gmm-init-model": "gmm_init_model",
    "gmm-mixup": "gmm_mixup",
    "gmm-gselect": "gmm_gselect",
    "fgmm-gselect": "fgmm_gselect",
    "gmm-global-get-post": "gmm_global_get_post",
    "gmm-global-info": "gmm_global_info",
    "fgmm-global-info": "fgmm_global_info",
    "fgmm-global-copy": "fgmm_global_copy",
    "convert-ali": "convert_ali",
    "gmm-acc-mllt": "gmm_acc_mllt",
    "est-mllt": "est_mllt",
    "est-pca": "est_pca",
    "make-h-transducer": "make_h_transducer",
    "add-self-loops": "add_self_loops",
    "compile-graph": "compile_graph",
})

_register("kaldi_tpu.cli.rnnlm_tools", {
    "rnnlm-train": "rnnlm_train",
    "rnnlm-sentence-probs": "rnnlm_sentence_probs",
    "rnnlm-compute-prob": "rnnlm_compute_prob",
    "rnnlm-get-sampling-lm": "rnnlm_get_sampling_lm",
    "lattice-lmrescore-kaldi-rnnlm": "lattice_lmrescore_kaldi_rnnlm",
})

_register("kaldi_tpu.cli.nnet3_tools2", {
    "nnet3-get-egs": "nnet3_get_egs",
    "nnet3-copy-egs": "nnet3_copy_egs",
    "nnet3-shuffle-egs": "nnet3_shuffle_egs",
    "nnet3-merge-egs": "nnet3_merge_egs",
    "nnet3-subset-egs": "nnet3_subset_egs",
    "nnet3-copy": "nnet3_copy",
    "nnet3-average": "nnet3_average",
    "nnet3-compute-from-egs": "nnet3_compute_from_egs",
    "nnet3-compute-prob": "nnet3_compute_prob",
})

_register("kaldi_tpu.cli.lat_tools3", {
    "lattice-add-trans-probs": "lattice_add_trans_probs",
    "lattice-copy-backoff": "lattice_copy_backoff",
    "lattice-rescore-mapped": "lattice_rescore_mapped",
    "nbest-to-lattice": "nbest_to_lattice",
    "lattice-minimize": "lattice_minimize",
    "lattice-to-kws-index": "lattice_to_kws_index",
    "kws-index-union": "kws_index_union",
    "kws-search": "kws_search",
    "compute-atwv": "compute_atwv",
})

_register("kaldi_tpu.cli.tail5_tools", {
    "feat-to-post": "feat_to_post",
    "prob-to-post": "prob_to_post",
    "logprob-to-post": "logprob_to_post",
    "get-post-on-ali": "get_post_on_ali",
    "post-to-tacc": "post_to_tacc",
    "matrix-sum-rows": "matrix_sum_rows",
    "sum-matrices": "sum_matrices",
    "paste-vectors": "paste_vectors",
    "multiply-vectors": "multiply_vectors",
    "transform-vec": "transform_vec",
    "compare-int-vector": "compare_int_vector",
    "analyze-counts": "analyze_counts",
    "select-voiced-frames": "select_voiced_frames",
    "merge-vads": "merge_vads",
    "compute-vad-from-frame-likes": "compute_vad_from_frame_likes",
    "gmm-compute-likes": "gmm_compute_likes",
    "gmm-adapt-map": "gmm_adapt_map",
    "gmm-rescore-lattice": "gmm_rescore_lattice",
    "decode-faster-mapped": "decode_faster_mapped",
    "hmm-info": "hmm_info",
    "ivector-extractor-init": "ivector_extractor_init",
    "ivector-extractor-acc-stats": "ivector_extractor_acc_stats",
    "ivector-extractor-sum-accs": "ivector_extractor_sum_accs",
    "ivector-extractor-est": "ivector_extractor_est",
    "ivector-compute-lda": "ivector_compute_lda",
    "ivector-transform": "ivector_transform",
})

_register("kaldi_tpu.cli.sgmm2_tools", {
    "sgmm2-init": "sgmm2_init",
    "sgmm2-acc-stats-ali": "sgmm2_acc_stats_ali",
    "sgmm2-acc-stats": "sgmm2_acc_stats",
    "sgmm2-sum-accs": "sgmm2_sum_accs",
    "sgmm2-est": "sgmm2_est",
    "sgmm2-est-spkvecs": "sgmm2_est_spkvecs",
    "sgmm2-latgen-faster": "sgmm2_latgen_faster",
    "sgmm2-info": "sgmm2_info",
    "sgmm2-copy": "sgmm2_copy",
    "sgmm2-gselect": "sgmm2_gselect",
    "sgmm2-align-compiled": "sgmm2_align_compiled",
    "sgmm2-rescore-lattice": "sgmm2_rescore_lattice",
})


_register("kaldi_tpu.cli.nnet1_tools", {
    "nnet-initialize": "nnet_initialize",
    "nnet-copy": "nnet_copy",
    "nnet-info": "nnet_info",
    "nnet-concat": "nnet_concat",
    "nnet-forward": "nnet_forward",
    "transf-to-nnet": "transf_to_nnet",
    "cmvn-to-nnet": "cmvn_to_nnet",
    "nnet-set-learnrate": "nnet_set_learnrate",
    "nnet-train-frmshuff": "nnet_train_frmshuff",
    "nnet-train-perutt": "nnet_train_perutt",
    "nnet-train-multistream": "nnet_train_multistream",
    "nnet-train-multistream-perutt": "nnet_train_multistream_perutt",
    "nnet-train-mmi-sequential": "nnet_train_mmi_sequential",
    "nnet-train-mpe-sequential": "nnet_train_mpe_sequential",
    "rbm-convert-to-nnet": "rbm_convert_to_nnet",
    "rbm-train-cd1-frmshuff": "rbm_train_cd1_frmshuff",
})

_register("kaldi_tpu.cli.tail15_tools", {
    "make-grammar-fst": "make_grammar_fst",
    "nnet3-latgen-grammar": "nnet3_latgen_grammar",
    "online2-wav-nnet3-latgen-grammar":
        "online2_wav_nnet3_latgen_grammar",
    "online2-wav-nnet3-latgen-incremental":
        "online2_wav_nnet3_latgen_incremental",
    "nnet3-compute-batch": "nnet3_compute_batch",
    "nnet3-xvector-compute-batched": "nnet3_xvector_compute_batched",
    "nnet3-egs-augment-image": "nnet3_egs_augment_image",
    "compute-mfcc-feats-cuda": "compute_mfcc_feats_cuda",
    "compute-fbank-feats-cuda": "compute_fbank_feats_cuda",
    "compute-mfcc-online-batched-cuda":
        "compute_mfcc_online_batched_cuda",
    "compute-fbank-online-batched-cuda":
        "compute_fbank_online_batched_cuda",
    "apply-cmvn-online-cuda": "apply_cmvn_online_cuda",
    "apply-batched-cmvn-online-cuda":
        "apply_batched_cmvn_online_cuda",
    "compute-online-feats-cuda": "compute_online_feats_cuda",
    "compute-online-feats-batched-cuda":
        "compute_online_feats_batched_cuda",
    "batched-wav-nnet3-cuda2": "batched_wav_nnet3_cuda2",
    "batched-wav-nnet3-cuda": "batched_wav_nnet3_cuda",
    "batched-wav-nnet3-cuda-online": "batched_wav_nnet3_cuda_online",
})


def get_tool(name: str) -> Callable[[List[str]], int]:
    module_name, func = TOOLS[name]
    module = importlib.import_module(module_name)
    return getattr(module, func)
