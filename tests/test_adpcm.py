"""ADPCM decode tests: encode with a minimal spec encoder, decode with ours
AND with SDL (pygame) as the external reference, compare all three."""

import io
import os
import struct

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.codecs.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    MS_ADAPT_TABLE,
    MS_COEFFS,
)
from symphonia_tpu.core.io import MediaSourceStream


def ima_encode(samples: np.ndarray, block_frames: int = 505) -> tuple:
    """Mono IMA-WAV encoder. Returns (blocks bytes, block_align)."""
    blocks = bytearray()
    idx = 0
    n = len(samples)
    bpb = 4 + (block_frames - 1) // 2  # mono block size
    for start in range(0, n, block_frames):
        chunk = samples[start : start + block_frames]
        if len(chunk) < block_frames:
            chunk = np.pad(chunk, (0, block_frames - len(chunk)))
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # Decoder recurrence to track state.
            step_ = int(IMA_STEP_TABLE[idx])
            d = step_ >> 3
            if nib & 1:
                d += step_ >> 2
            if nib & 2:
                d += step_ >> 1
            if nib & 4:
                d += step_
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
            nibbles.append(nib)
        for i in range(0, len(nibbles), 2):
            lo = nibbles[i]
            hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
            blocks.append(lo | (hi << 4))
    return bytes(blocks), bpb


def ms_encode(samples: np.ndarray, block_frames: int = 500) -> tuple:
    """Mono MS-ADPCM encoder with predictor 0. Returns (bytes, align)."""
    blocks = bytearray()
    n = len(samples)
    bpb = 7 + (block_frames - 2 + 1) // 2
    for start in range(0, n, block_frames):
        chunk = samples[start : start + block_frames]
        if len(chunk) < block_frames:
            chunk = np.pad(chunk, (0, block_frames - len(chunk)))
        s2, s1 = int(chunk[0]), int(chunk[1])
        delta = 256
        blocks += struct.pack("<Bhhh", 0, delta, s1, s2)
        c1, c2 = (int(v) for v in MS_COEFFS[0])
        nibbles = []
        for s in chunk[2:]:
            pred = (s1 * c1 + s2 * c2) // 256
            err = int(s) - pred
            nib = max(-8, min(7, int(round(err / delta)))) & 0xF
            signed = nib - 16 if nib & 8 else nib
            rec = max(-32768, min(32767, pred + signed * delta))
            s2, s1 = s1, rec
            delta = max(16, int(MS_ADAPT_TABLE[nib]) * delta // 256)
            nibbles.append(nib)
        for i in range(0, len(nibbles), 2):
            hi = nibbles[i]
            lo = nibbles[i + 1] if i + 1 < len(nibbles) else 0
            blocks.append((hi << 4) | lo)
    return bytes(blocks), bpb


def make_adpcm_wav(payload: bytes, fmt_tag: int, block_align: int,
                   frames_per_block: int, n_frames: int, rate=22050) -> bytes:
    if fmt_tag == 0x02:
        # MS ADPCM: samples/block + coefficient table (Microsoft WAVE spec).
        extra = struct.pack("<HH", frames_per_block, 7)
        for c1, c2 in MS_COEFFS:
            extra += struct.pack("<hh", int(c1), int(c2))
    else:
        extra = struct.pack("<H", frames_per_block)
    fmt = struct.pack("<HHIIHHH", fmt_tag, 1, rate,
                      rate * block_align // frames_per_block, block_align, 4,
                      len(extra)) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n_frames)
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def our_decode(data: bytes):
    mss = MediaSourceStream(data)
    probed = sym.get_probe().probe(mss)
    fmt = probed.format
    track = fmt.default_track()
    dec = sym.get_codecs().make_audio_decoder(track.codec_params)
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        outs.append(dec.decode(pkt).planes().copy())
    return np.concatenate(outs, axis=1), track


def sdl_decode_wav(data: bytes, rate: int, channels: int):
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame

    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    snd = pygame.mixer.Sound(io.BytesIO(data))
    raw = np.frombuffer(snd.get_raw(), dtype=np.int16)
    return raw.reshape(-1, channels).T.astype(np.int32)


def smooth_signal(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.integers(-400, 401, size=n))
    return np.clip(x, -30000, 30000).astype(np.int32)


class TestImaWav:
    def test_vs_sdl(self):
        sig = smooth_signal(5050, 1)
        payload, ba = ima_encode(sig)
        wav = make_adpcm_wav(payload, 0x11, ba, 505, len(sig))
        ours, track = our_decode(wav)
        assert track.codec_params.codec == "adpcm_ima_wav"
        ref = sdl_decode_wav(wav, 22050, 1)
        n = min(ours.shape[1], ref.shape[1])
        np.testing.assert_array_equal(ours[:, :n], ref[:, :n])

    def test_tracks_encoder_state(self):
        # Our decode must exactly invert the encoder recurrence.
        sig = smooth_signal(1010, 2)
        payload, ba = ima_encode(sig, block_frames=505)
        from symphonia_tpu.codecs.adpcm import decode_ima_wav_block

        out = decode_ima_wav_block(payload[:ba], 1)
        # Predictor of sample 0 is exact; later samples track within step.
        assert out[0, 0] == sig[0]


class TestMsAdpcm:
    def test_vs_sdl(self):
        sig = smooth_signal(5000, 3)
        payload, ba = ms_encode(sig)
        wav = make_adpcm_wav(payload, 0x02, ba, 500, len(sig))
        ours, track = our_decode(wav)
        assert track.codec_params.codec == "adpcm_ms"
        ref = sdl_decode_wav(wav, 22050, 1)
        n = min(ours.shape[1], ref.shape[1])
        np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


class TestNativeLoopParity:
    """The native IMA/MS recurrences (native/adpcm_loops.cpp) must match
    the Python loops bit-for-bit, including on adversarial blocks."""

    def test_ima_and_ms_match_python(self):
        from symphonia_tpu import native as nat
        from symphonia_tpu.codecs import adpcm as A

        if not nat.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(55)
        orig_ima, orig_ms = nat.ima_decode_nibbles, nat.ms_decode_nibbles
        try:
            for seed in range(8):
                r = np.random.default_rng(seed)
                blk = bytearray(r.integers(0, 256, size=1024, dtype=np.uint8))
                blk[2] = int(r.integers(0, 89)); blk[3] = 0
                blk[6] = int(r.integers(0, 89)); blk[7] = 0
                blk = bytes(blk)
                fast = A.decode_ima_wav_block(blk, 2)
                nat.ima_decode_nibbles = lambda *a: None
                slow = A.decode_ima_wav_block(blk, 2)
                nat.ima_decode_nibbles = orig_ima
                np.testing.assert_array_equal(fast, slow)

                msb = bytearray(r.integers(0, 256, size=512, dtype=np.uint8))
                msb[0] = int(r.integers(0, 7)); msb[1] = int(r.integers(0, 7))
                msb = bytes(msb)
                fast = A.decode_ms_block(msb, 2)
                nat.ms_decode_nibbles = lambda *a: False
                slow = A.decode_ms_block(msb, 2)
                nat.ms_decode_nibbles = orig_ms
                np.testing.assert_array_equal(fast, slow)
        finally:
            nat.ima_decode_nibbles = orig_ima
            nat.ms_decode_nibbles = orig_ms

    def test_ms_delta_growth_bounded(self):
        """Regression: nibble-8 runs multiply delta by 3 per sample; a
        crafted block must not escalate to unbounded Python ints (the
        adaptation wraps at 32 bits like the reference's i32)."""
        from symphonia_tpu import native as nat
        from symphonia_tpu.codecs import adpcm as A

        blk = bytes([1, 1]) + b"\x7f\xff" * 2 + b"\x00\x10" * 4 + b"\x88" * 500
        orig_ms = nat.ms_decode_nibbles
        try:
            fast = A.decode_ms_block(blk, 2)
            nat.ms_decode_nibbles = lambda *a: False
            slow = A.decode_ms_block(blk, 2)
        finally:
            nat.ms_decode_nibbles = orig_ms
        np.testing.assert_array_equal(fast, slow)


class TestMisalignedImaBlock:
    def test_partial_group_block_decodes_whole_groups(self):
        """Regression (soak): a block whose data area is not a multiple of
        the 4-byte-per-channel group size computed frames from raw bytes
        but decoded only whole groups — the shorter nibble array then
        failed to broadcast into the output (raw ValueError escaped the
        taxonomy). Partial trailing groups are now dropped."""
        from symphonia_tpu.codecs.adpcm import decode_ima_wav_block

        hdr = bytes([0, 0, 40, 0, 0, 0, 40, 0])
        out = decode_ima_wav_block(hdr + bytes(11), 2)  # 11 % 8 != 0
        assert out.shape == (2, 1 + (11 // 8) * 8)


# ---------------------------------------------------------------------------
# IMA QT (ima4): the Apple 34-byte-per-channel chunk variant used by
# AIFF-C `ima4` and CAF. Previously ZERO coverage — a sign bug in the
# 9-bit left-justified packet predictor (negative values crashed with
# OverflowError under NEP-50 numpy) survived every suite run.
# ---------------------------------------------------------------------------


def _ima_step(pred, idx, nib):
    step = int(IMA_STEP_TABLE[idx])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
    return pred, idx


def ima_qt_encode(sig: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode one channel as ima4 34-byte chunks; returns (payload, the
    exact PCM a conforming decoder reproduces)."""
    n = len(sig) - (len(sig) % 64)
    sig = sig[:n]
    pred, idx = 0, 0
    out = bytearray()
    ref = np.empty(n, dtype=np.int32)
    for base in range(0, n, 64):
        # Header: current predictor's top 9 bits (signed) + step index.
        pred &= ~0x7F  # the header truncates; decoder resumes from this
        out += struct.pack(">H", (pred & 0xFF80) | idx)
        nibbles = []
        for i in range(64):
            s = int(sig[base + i])
            step = int(IMA_STEP_TABLE[idx])
            diff = s - pred
            nib = 8 if diff < 0 else 0
            if diff < 0:
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            ref[base + i] = pred
            nibbles.append(nib)
        for j in range(0, 64, 2):
            out.append(nibbles[j] | (nibbles[j + 1] << 4))
    return bytes(out), ref


class TestImaQt:
    def _signal(self, n, seed, offset=0):
        rng = np.random.default_rng(seed)
        return np.clip(np.cumsum(rng.integers(-800, 801, size=n)) + offset,
                       -32768, 32767).astype(np.int64)

    @pytest.mark.parametrize("offset", [0, -25000, 25000])
    def test_decoder_matches_spec_recurrence(self, offset):
        # Negative offsets drive the packet-header predictor sign bit —
        # the case the old np.int16() cast crashed on.
        from symphonia_tpu.codecs.adpcm import AdpcmDecoder
        from symphonia_tpu.core.audio import Channels
        from symphonia_tpu.core.codecs import AudioCodecParameters
        from symphonia_tpu.core.packet import Packet

        sig = self._signal(64 * 8, seed=1, offset=offset)
        payload, ref = ima_qt_encode(sig)
        params = AudioCodecParameters(
            codec="adpcm_ima_qt", sample_rate=44100,
            channels=Channels.from_count(1), bits_per_sample=16)
        dec = AdpcmDecoder(params)
        out = dec.decode(Packet(track_id=0, ts=0, dur=64 * 8, data=payload))
        np.testing.assert_array_equal(out.planes()[0], ref)

    def test_through_aiff_ima4(self):
        from test_aiff_caf import decode_all

        sig = self._signal(64 * 20, seed=2, offset=-20000)
        payload, ref = ima_qt_encode(sig)
        n_frames = len(ref)
        comm = struct.pack(">HIH", 1, n_frames, 16) + _f80_for(44100)
        comm += b"ima4" + b"\x00\x00"
        chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
        ssnd = struct.pack(">II", 0, 0) + payload
        chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        data = b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks
        out, track, _ = decode_all(data)
        np.testing.assert_array_equal(out[0][:n_frames], ref)

    def test_through_caf_ima4(self):
        from test_aiff_caf import decode_all

        sig = self._signal(64 * 20, seed=3, offset=-20000)
        payload, ref = ima_qt_encode(sig)
        desc = struct.pack(">d", 44100.0) + b"ima4" + struct.pack(
            ">IIIII", 0, 34, 64, 1, 0)
        data = b"caff" + struct.pack(">HH", 1, 0)
        data += b"desc" + struct.pack(">q", len(desc)) + desc
        data += b"data" + struct.pack(">q", len(payload) + 4) + b"\x00" * 4 + payload
        out, track, _ = decode_all(data)
        np.testing.assert_array_equal(out[0][: len(ref)], ref)


def _f80_for(rate: float) -> bytes:
    import math

    exp = int(math.floor(math.log2(rate)))
    mantissa = int(rate / 2.0**exp * (1 << 63))
    return struct.pack(">H", exp + 16383) + mantissa.to_bytes(8, "big")
