"""ALAC decode tests: bit-exact roundtrip against the mirror encoder
(verbatim + compressed with adaptive predictor + mid-side), and CAF
integration."""

import struct

import numpy as np
import pytest

from symphonia_tpu.codecs.alac import AlacDecoder, MagicCookie, lg3a
from symphonia_tpu.core.codecs import AudioCodecParameters
from symphonia_tpu.core.audio import Channels
from symphonia_tpu.core.packet import Packet

from alac_builder import build_cookie, encode_frame_compressed, encode_frame_verbatim


def make_decoder(frame_length=4096, bit_depth=16, n_ch=1, rate=44100):
    cookie_bytes = build_cookie(frame_length, bit_depth, n_ch, rate)
    params = AudioCodecParameters(
        codec="alac", sample_rate=rate, bits_per_sample=bit_depth,
        channels=Channels.from_count(n_ch), extra_data=cookie_bytes,
    )
    cookie = dict(frame_length=frame_length, bit_depth=bit_depth, pb=40,
                  mb=10, kb=14)
    return AlacDecoder(params), cookie


def signal(n, seed, ch=1, bits=16):
    rng = np.random.default_rng(seed)
    lim = (1 << (bits - 1)) - 1
    out = []
    for _ in range(ch):
        x = np.clip(np.cumsum(rng.integers(-300, 301, size=n)), -lim, lim)
        out.append(x.astype(np.int64))
    return out


class TestVerbatim:
    def test_mono(self):
        dec, cookie = make_decoder(frame_length=512)
        ch = signal(512, 1)
        data = encode_frame_verbatim(ch, cookie | {"frame_length": 512})
        buf = dec.decode(Packet(0, 0, 512, data))
        np.testing.assert_array_equal(buf.planes()[0], ch[0])

    def test_stereo(self):
        dec, cookie = make_decoder(frame_length=256, n_ch=2)
        ch = signal(256, 2, ch=2)
        data = encode_frame_verbatim(ch, cookie | {"frame_length": 256})
        buf = dec.decode(Packet(0, 0, 256, data))
        np.testing.assert_array_equal(buf.planes(), np.stack(ch))

    def test_partial_frame(self):
        dec, cookie = make_decoder(frame_length=4096)
        ch = signal(1000, 3)
        data = encode_frame_verbatim(ch, cookie)
        buf = dec.decode(Packet(0, 0, 1000, data))
        assert buf.frames == 1000
        np.testing.assert_array_equal(buf.planes()[0], ch[0])


class TestCompressed:
    @pytest.mark.parametrize("order", [1, 2, 4, 8])
    def test_mono_orders(self, order):
        dec, cookie = make_decoder(frame_length=2048)
        ch = signal(2048, 10 + order)
        rng = np.random.default_rng(order)
        coeffs = rng.integers(-2000, 2000, size=order).tolist()
        data = encode_frame_compressed(ch, cookie | {"frame_length": 2048},
                                       order=order, coeffs=coeffs)
        buf = dec.decode(Packet(0, 0, 2048, data))
        np.testing.assert_array_equal(buf.planes()[0], ch[0])

    def test_with_zero_runs(self):
        # Sparse signal with long zero runs exercises the run-length path.
        dec, cookie = make_decoder(frame_length=1024)
        x = np.zeros(1024, dtype=np.int64)
        x[10] = 500
        x[500:505] = [-3, 7, -1, 2, 9]
        x[900] = -12000
        data = encode_frame_compressed([x], cookie | {"frame_length": 1024},
                                       order=1, coeffs=[0], lpc_shift=0)
        buf = dec.decode(Packet(0, 0, 1024, data))
        np.testing.assert_array_equal(buf.planes()[0], x)

    def test_stereo_mid_side(self):
        dec, cookie = make_decoder(frame_length=1024, n_ch=2)
        ch = signal(1024, 20, ch=2)
        data = encode_frame_compressed(ch, cookie | {"frame_length": 1024},
                                       order=2, coeffs=[40, -10],
                                       ms_weight=3, ms_shift=2)
        buf = dec.decode(Packet(0, 0, 1024, data))
        np.testing.assert_array_equal(buf.planes(), np.stack(ch))

    def test_24bit(self):
        dec, cookie = make_decoder(frame_length=512, bit_depth=24)
        ch = signal(512, 30, bits=24)
        c = cookie | {"frame_length": 512, "bit_depth": 24}
        data = encode_frame_compressed(ch, c, order=2)
        buf = dec.decode(Packet(0, 0, 512, data))
        np.testing.assert_array_equal(buf.planes()[0], ch[0])
        assert buf.bits_per_sample == 24


class TestCookie:
    def test_parse(self):
        c = MagicCookie.read(build_cookie(4096, 16, 2, 44100))
        assert c.frame_length == 4096
        assert c.bit_depth == 16
        assert c.num_channels == 2
        assert c.sample_rate == 44100

    def test_lg3a(self):
        assert lg3a(0) == 1  # (0>>9)+3 = 3 -> log2 = 1
        assert lg3a(10) == 1
        assert lg3a(1 << 15) == 6


class TestCafIntegration:
    def test_alac_in_caf(self):
        import symphonia_tpu as sym
        from symphonia_tpu.core.io import MediaSourceStream

        frame_len = 512
        ch = signal(frame_len * 3, 40)
        cookie_dict = dict(frame_length=frame_len, bit_depth=16, pb=40, mb=10, kb=14)
        frames = [
            encode_frame_compressed([ch[0][i * frame_len : (i + 1) * frame_len]],
                                    cookie_dict, order=2)
            for i in range(3)
        ]
        cookie_bytes = build_cookie(frame_len, 16, 1, 44100)
        # CAF: desc (alac) + kuki (cookie) + pakt + data
        desc = struct.pack(">d", 44100.0) + b"alac" + struct.pack(
            ">IIIII", 0, 0, frame_len, 1, 16
        )
        pakt_body = struct.pack(">qqii", len(frames), len(frames) * frame_len, 0, 0)
        for f in frames:
            n = len(f)
            varint = bytearray()
            while True:
                varint.insert(0, n & 0x7F)
                n >>= 7
                if not n:
                    break
            for i in range(len(varint) - 1):
                varint[i] |= 0x80
            pakt_body += bytes(varint)
        payload = b"".join(frames)
        data = b"caff" + struct.pack(">HH", 1, 0)
        data += b"desc" + struct.pack(">q", len(desc)) + desc
        data += b"kuki" + struct.pack(">q", len(cookie_bytes)) + cookie_bytes
        data += b"pakt" + struct.pack(">q", len(pakt_body)) + pakt_body
        data += b"data" + struct.pack(">q", len(payload) + 4) + struct.pack(">I", 0) + payload

        probed = sym.get_probe().probe(MediaSourceStream(data))
        track = probed.format.default_track()
        assert track.codec_params.codec == "alac"
        dec = sym.get_codecs().make_audio_decoder(track.codec_params)
        outs = []
        while True:
            p = probed.format.next_packet()
            if p is None:
                break
            outs.append(dec.decode(p).planes().copy())
        got = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(got[0], ch[0])


class TestNativeParity:
    """The native decoder (native/alac_decode.cpp) must match the Python
    path bit-for-bit across element shapes; errors must fall back."""

    def _both(self, monkeypatch, cookie_bytes, pkt_data, n_ch, rate=44100,
              bits=16):
        from symphonia_tpu import native as nat
        from symphonia_tpu.codecs.alac import AlacDecoder
        from symphonia_tpu.core.packet import Packet

        if not nat.available():
            pytest.skip("native library unavailable")
        params = AudioCodecParameters(
            codec="alac", sample_rate=rate, bits_per_sample=bits,
            channels=Channels.from_count(n_ch), extra_data=cookie_bytes)
        got = {}
        for mode in ("native", "python"):
            if mode == "python":
                monkeypatch.setattr(nat, "alac_decode",
                                    lambda *a, **k: None)
            dec = AlacDecoder(params)
            buf = dec.decode(Packet(track_id=0, ts=0, dur=0, data=pkt_data))
            got[mode] = np.asarray(buf.planes()).copy()
        monkeypatch.undo()
        np.testing.assert_array_equal(got["native"], got["python"])
        return got["native"]

    def test_compressed_stereo_orders(self, monkeypatch):
        rng = np.random.default_rng(91)
        for order in (1, 2, 3, 4):
            ch = np.clip(np.cumsum(rng.integers(-400, 401, size=(2, 2048)),
                                   axis=1), -30000, 30000).astype(np.int64)
            cookie_bytes = build_cookie(2048, 16, 2, 44100)
            ck = dict(frame_length=2048, bit_depth=16, pb=40, mb=10, kb=14)
            pkt = encode_frame_compressed([ch[0], ch[1]], ck, order=order)
            out = self._both(monkeypatch, cookie_bytes, pkt, 2)
            assert out.shape == (2, 2048)

    def test_verbatim_and_partial(self, monkeypatch):
        rng = np.random.default_rng(92)
        ch = [rng.integers(-30000, 30000, size=512).astype(np.int64)
              for _ in range(2)]
        cookie_bytes = build_cookie(1024, 16, 2, 44100)
        ck = dict(frame_length=1024, bit_depth=16, pb=40, mb=10, kb=14,
                  num_channels=2)
        pkt = encode_frame_verbatim(ch, ck)  # num 512 != 1024 -> partial
        out = self._both(monkeypatch, cookie_bytes, pkt, 2)
        assert out.shape[1] == 512

    def test_truncated_packet_falls_back(self, monkeypatch):
        """An errored native decode must defer to the Python path (which
        raises the taxonomy error the oracle raises)."""
        from symphonia_tpu import native as nat
        from symphonia_tpu.codecs.alac import AlacDecoder
        from symphonia_tpu.core.errors import DecodeError, IoError
        from symphonia_tpu.core.packet import Packet

        if not nat.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(93)
        ch = np.clip(np.cumsum(rng.integers(-400, 401, size=(2, 2048)),
                               axis=1), -30000, 30000).astype(np.int64)
        cookie_bytes = build_cookie(2048, 16, 2, 44100)
        ck = dict(frame_length=2048, bit_depth=16, pb=40, mb=10, kb=14)
        pkt = encode_frame_compressed([ch[0], ch[1]], ck, order=4)
        params = AudioCodecParameters(
            codec="alac", sample_rate=44100, bits_per_sample=16,
            channels=Channels.from_count(2), extra_data=cookie_bytes)
        dec = AlacDecoder(params)
        with pytest.raises((DecodeError, IoError, EOFError)):
            dec.decode(Packet(track_id=0, ts=0, dur=0,
                              data=pkt[: len(pkt) // 3]))
