"""MPEG Layer I/II decode (symphonia-bundle-mp3/src/layer1,layer2,layer12.rs).

Layer I: 384-sample frames, 32 subbands, per-subband 4-bit allocation +
6-bit scalefactors, linear dequantization (layer1/mod.rs:62).
Layer II: 1152-sample frames, allocation tables by bitrate/rate class with
grouped quantization (layer2/mod.rs:219).

Implementation lands after Layer III is validated; the class boundary is in
place so the decoder dispatches already.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import Unsupported
from .mpa_common import MpaHeader


class Layer12State:
    def __init__(self):
        # 32-band polyphase synthesis state per channel (shared with L3).
        from ..ops.mp3_dense import GranuleDenseState

        self.synth_tail = [np.zeros(480, np.float32), np.zeros(480, np.float32)]

    def reset(self):
        for t in self.synth_tail:
            t[:] = 0


def decode_frame(header: MpaHeader, frame: bytes, state: Layer12State) -> np.ndarray:
    raise Unsupported("MP1/MP2 decode not yet implemented")
