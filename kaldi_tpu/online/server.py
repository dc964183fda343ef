"""TCP streaming decode server (parity: online2bin/
online2-tcp-nnet3-decode-faster.cc protocol).

Protocol (same as the reference tool): the client streams raw 16-bit
little-endian PCM at `samp_freq` over a TCP connection; the server
decodes incrementally and writes text lines back —
  - partial hypotheses terminated by '\\r' (overwritten in place by
    terminal clients),
  - finalized segments terminated by '\\n' (on endpoint or when the
    client shuts down its write side).

The acoustic scorer is pluggable (GMM or nnet3 chain scorer); decoding
runs one thread per connection over the shared read-only model."""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Callable, Optional

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.online.decoding import (OnlineEndpointConfig,
                                       SingleUtteranceDecoder,
                                       endpoint_detected)
from kaldi_tpu.online.features import OnlineFeature


class DecodeSession:
    """One connection's incremental decode state."""

    def __init__(self, server: "TcpDecodeServer"):
        self.server = server
        self.pipeline = server.make_pipeline()
        self.decoder = SingleUtteranceDecoder(
            server.hclg, server.tm, server.scorer, self.pipeline,
            acoustic_scale=server.acoustic_scale)
        self.samples = 0

    def accept_pcm(self, data: bytes) -> Optional[str]:
        """Feed raw PCM bytes; returns the current partial hypothesis
        (or None if nothing decodable yet)."""
        pcm = np.frombuffer(data, "<i2").astype(np.float32)
        self.pipeline.accept_waveform(self.server.samp_freq, pcm)
        self.samples += len(pcm)
        self.decoder.advance_decoding()
        res = self.decoder.decoder.best_path(use_final_probs=False)
        if res is None:
            return None
        return " ".join(self.server.word_names.get(w, str(w))
                        for w in res[1])

    def endpoint(self) -> bool:
        return self.decoder.endpoint_detected(self.server.endpoint_config)

    def finalize(self) -> str:
        self.pipeline.input_finished()
        self.decoder.advance_decoding()
        res = self.decoder.finalize_decoding()
        if res is None:
            return ""
        return " ".join(self.server.word_names.get(w, str(w))
                        for w in res[1])


class TcpDecodeServer:
    def __init__(self, hclg, tm, scorer: Callable, word_names,
                 make_pipeline: Callable[[], object],
                 samp_freq: float = 8000.0,
                 acoustic_scale: float = 0.1,
                 chunk_ms: int = 180,
                 endpoint_config: Optional[OnlineEndpointConfig] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.hclg = hclg
        self.tm = tm
        self.scorer = scorer
        self.word_names = dict(word_names)
        self.make_pipeline = make_pipeline
        self.samp_freq = samp_freq
        self.acoustic_scale = acoustic_scale
        self.chunk_bytes = max(2, int(samp_freq * chunk_ms / 1000) * 2)
        self.endpoint_config = endpoint_config or OnlineEndpointConfig()
        self.num_served = 0       # completed connections (CLI exit-after)
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):  # noqa: D401
                try:
                    self._handle()
                except (ConnectionError, BrokenPipeError) as e:
                    warn(f"client {self.client_address} dropped: {e}")
                finally:
                    outer.num_served += 1

            def _handle(self):
                sess = DecodeSession(outer)
                buf = b""
                sock: socket.socket = self.request
                while True:
                    data = sock.recv(4096)
                    if not data:
                        break
                    buf += data
                    while len(buf) >= outer.chunk_bytes:
                        chunk, buf = buf[:outer.chunk_bytes], \
                            buf[outer.chunk_bytes:]
                        partial = sess.accept_pcm(chunk)
                        if partial is not None:
                            sock.sendall((partial + "\r").encode())
                        if sess.endpoint():
                            final = sess.finalize()
                            sock.sendall((final + "\n").encode())
                            sess = DecodeSession(outer)
                if buf:
                    sess.accept_pcm(buf[:len(buf) // 2 * 2])
                final = sess.finalize()
                sock.sendall((final + "\n").encode())

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        log(f"TCP decode server listening on {self.host}:{self.port}")

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
