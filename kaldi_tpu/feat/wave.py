"""RIFF WAV read/write (parity: feat/wave-reader.h:106 WaveData).

Kaldi convention: samples are kept as float32 with int16-range values
(NOT normalized to ±1); data shape is (num_channels, num_samples).
Supports PCM16/PCM8/PCM32/float32, chunk skipping, and streaming pipes
(e.g. "sox ... -t wav - |" rxfilenames).
"""

from __future__ import annotations

import struct
from typing import BinaryIO

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError


class WaveData:
    def __init__(self, samp_freq: float, data: np.ndarray):
        data = np.atleast_2d(np.asarray(data, dtype=np.float32))
        self.samp_freq = float(samp_freq)
        self.data = data  # (channels, samples)

    @property
    def duration(self) -> float:
        return self.data.shape[1] / self.samp_freq

    def channel(self, c: int = 0) -> np.ndarray:
        return self.data[c]

    @classmethod
    def read(cls, stream: BinaryIO) -> "WaveData":
        riff = stream.read(4)
        if riff not in (b"RIFF", b"RIFX"):
            raise KaldiTpuError(f"not a RIFF file (got {riff!r})")
        big_endian = riff == b"RIFX"
        e = ">" if big_endian else "<"
        stream.read(4)  # riff size (often wrong for piped wavs; ignore)
        wave = stream.read(4)
        if wave != b"WAVE":
            raise KaldiTpuError(f"not a WAVE file (got {wave!r})")
        fmt = None
        data = None
        while True:
            head = stream.read(8)
            if len(head) < 8:
                break
            chunk_id = head[:4]
            size = struct.unpack(e + "I", head[4:])[0]
            if chunk_id == b"fmt ":
                fmt = stream.read(size)
            elif chunk_id == b"data":
                if size == 0 or size == 0xFFFFFFFF:
                    data = stream.read()  # streamed: read to EOF
                else:
                    data = stream.read(size)
                break  # data is the last chunk we care about
            else:
                stream.read(size + (size & 1))
        if fmt is None or data is None:
            raise KaldiTpuError("missing fmt/data chunk in wav")
        (audio_format, channels, samp_freq, _br, block_align,
         bits) = struct.unpack(e + "HHIIHH", fmt[:16])
        if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
            audio_format = struct.unpack(e + "H", fmt[24:26])[0]
        if audio_format == 1:  # PCM
            if bits == 16:
                arr = np.frombuffer(data, dtype=e + "i2").astype(np.float32)
            elif bits == 8:
                arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                       - 128.0) * 256.0
            elif bits == 32:
                arr = np.frombuffer(data, dtype=e + "i4").astype(np.float32) / 65536.0
            else:
                raise KaldiTpuError(f"unsupported PCM bit depth {bits}")
        elif audio_format == 3 and bits == 32:  # IEEE float
            arr = np.frombuffer(data, dtype=e + "f4").astype(np.float32) * 32768.0
        else:
            raise KaldiTpuError(f"unsupported wav format {audio_format}")
        n = (len(arr) // channels) * channels
        arr = arr[:n].reshape(-1, channels).T.copy()
        return cls(samp_freq, arr)

    def write(self, stream: BinaryIO) -> None:
        channels, samples = self.data.shape
        pcm = np.clip(np.round(self.data.T), -32768, 32767).astype("<i2")
        payload = pcm.tobytes()
        stream.write(b"RIFF")
        stream.write(struct.pack("<I", 36 + len(payload)))
        stream.write(b"WAVE")
        stream.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                           int(self.samp_freq),
                                           int(self.samp_freq) * channels * 2,
                                           channels * 2, 16))
        stream.write(b"data" + struct.pack("<I", len(payload)))
        stream.write(payload)
