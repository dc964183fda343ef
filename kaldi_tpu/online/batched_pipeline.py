"""Batched multi-stream online pipeline (parity:
cudadecoder/batched-threaded-nnet3-cuda-online-pipeline.h:127 +
cuda-online-pipeline-dynamic-batcher.h:38).

Channels hold per-stream state (feature buffers, decoder tokens);
compute() plays the DynamicBatcher role: it gathers every channel's
newly-ready frames, pads them into ONE device batch, scores acoustics
in a single call, and advances each channel's search — the lanes of
the reference become the batch dimension of the jitted scorer."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import warn
from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
from kaldi_tpu.fstext.fst import VectorFst
from kaldi_tpu.online.decoding import (OnlineEndpointConfig,
                                       OnlineFasterDecoder,
                                       endpoint_detected)
from kaldi_tpu.online.features import OnlineFeature


@dataclass
class _Channel:
    feature: OnlineFeature
    decoder: OnlineFasterDecoder
    frames_consumed: int = 0
    finished: bool = False
    utterance_id: Optional[str] = None


class BatchedOnlinePipeline:
    def __init__(self, hclg: VectorFst, tm, feature_opts,
                 scorer: Callable[[np.ndarray], np.ndarray],
                 num_channels: int = 8,
                 acoustic_scale: float = 0.1,
                 decoder_opts: Optional[FasterDecoderOptions] = None,
                 endpoint_config: Optional[OnlineEndpointConfig] = None,
                 frame_shift: float = 0.01):
        self.hclg = hclg
        self.tm = tm
        self.feature_opts = feature_opts
        self.scorer = scorer
        self.acoustic_scale = acoustic_scale
        self.decoder_opts = decoder_opts or FasterDecoderOptions(beam=16.0)
        self.endpoint_config = endpoint_config
        self.frame_shift = frame_shift
        self.channels: List[Optional[_Channel]] = [None] * num_channels

    # -- channel management ---------------------------------------------------

    def init_channel(self, channel: int, utterance_id: str) -> None:
        self.channels[channel] = _Channel(
            OnlineFeature(self.feature_opts),
            OnlineFasterDecoder(self.hclg, self.decoder_opts),
            utterance_id=utterance_id)

    def free_channel(self, channel: int) -> None:
        self.channels[channel] = None

    def accept_waveform(self, channel: int, samp_freq: float,
                        samples: np.ndarray) -> None:
        ch = self.channels[channel]
        assert ch is not None and not ch.finished
        ch.feature.accept_waveform(samp_freq, samples)

    def input_finished(self, channel: int) -> None:
        ch = self.channels[channel]
        assert ch is not None
        ch.feature.finish_input()
        ch.finished = True

    # -- the batched compute step ----------------------------------------------

    def compute(self) -> int:
        """One dynamic batch: score all channels' pending frames in one
        device call, advance all decoders. Returns #frames advanced."""
        pending: List[Tuple[int, np.ndarray]] = []
        for i, ch in enumerate(self.channels):
            if ch is None:
                continue
            ready = ch.feature.num_frames_ready()
            if ready > ch.frames_consumed:
                feats = np.stack([ch.feature.get_frame(t) for t in
                                  range(ch.frames_consumed, ready)])
                pending.append((i, feats))
        if not pending:
            return 0
        Tmax = max(f.shape[0] for _, f in pending)
        dim = pending[0][1].shape[1]
        batch = np.zeros((len(pending), Tmax, dim), np.float32)
        for j, (_, f) in enumerate(pending):
            batch[j, :f.shape[0]] = f
        loglikes = np.asarray(self.scorer(batch))
        total = 0
        for j, (i, f) in enumerate(pending):
            ch = self.channels[i]
            n = f.shape[0]
            ch.decoder.advance_decoding(loglikes[j, :n], self.tm.id2pdf_id,
                                        self.acoustic_scale)
            ch.frames_consumed += n
            total += n
        return total

    # -- results ------------------------------------------------------------------

    def endpoint_detected(self, channel: int) -> bool:
        ch = self.channels[channel]
        if ch is None or self.endpoint_config is None:
            return False
        return endpoint_detected(self.endpoint_config, self.tm, ch.decoder,
                                 self.frame_shift)

    def get_best_path(self, channel: int, use_final: bool = True):
        ch = self.channels[channel]
        if ch is None:
            return None
        return ch.decoder.best_path(use_final_probs=use_final)


def decode_streams(pipeline: BatchedOnlinePipeline,
                   waves: Dict[str, np.ndarray], samp_freq: float,
                   chunk_seconds: float = 0.3) -> Dict[str, List[int]]:
    """Convenience offline wrapper (batched-wav pipeline2 role): feed
    many utterances through the online pipeline in chunks, dynamically
    assigning channels, and collect word hypotheses."""
    results: Dict[str, List[int]] = {}
    todo = list(waves.items())
    active: Dict[int, Tuple[str, np.ndarray, int]] = {}
    chunk = int(chunk_seconds * samp_freq)
    nch = len(pipeline.channels)
    while todo or active:
        # fill channels
        for c in range(nch):
            if c not in active and todo:
                utt, wave = todo.pop()
                pipeline.init_channel(c, utt)
                active[c] = (utt, wave, 0)
        # push one chunk per channel
        done_channels = []
        for c, (utt, wave, pos) in list(active.items()):
            if pos < len(wave):
                pipeline.accept_waveform(c, samp_freq,
                                         wave[pos:pos + chunk])
                active[c] = (utt, wave, pos + chunk)
            else:
                pipeline.input_finished(c)
                done_channels.append(c)
        pipeline.compute()
        for c in done_channels:
            utt, wave, _ = active.pop(c)
            res = pipeline.get_best_path(c)
            results[utt] = res[1] if res else []
            pipeline.free_channel(c)
    return results
