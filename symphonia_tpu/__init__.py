"""symphonia_tpu — a TPU-native batched audio decoding & demuxing framework.

A from-scratch re-expression of Symphonia's capabilities (reference:
pdeljanov/Symphonia) designed TPU-first: host-side demuxers parse containers
into packet tables, codec bitstreams are pre-scanned into frame-aligned
padded tensors, and the decode math (entropy LUT stages, IMDCT/polyphase
synthesis, LPC reconstruction) runs as batched jax/Pallas kernels sharded
over a device mesh.

Facade (analog of the ``symphonia`` crate, src/lib.rs): lazily constructed
global ``Probe`` and ``CodecRegistry`` with every enabled format/codec
registered (lib.rs:193-207,225).
"""

from __future__ import annotations

from typing import Optional

from .core import (  # noqa: F401  (re-exports)
    AudioBuffer,
    AudioCodecParameters,
    AudioDecoder,
    AudioDecoderOptions,
    AudioSpec,
    Channels,
    CodecRegistry,
    DecodeError,
    EndOfStream,
    Error,
    FormatOptions,
    FormatReader,
    Hint,
    IoError,
    MetadataOptions,
    Packet,
    Probe,
    ResetRequired,
    SampleFormat,
    SeekMode,
    SeekTo,
    Time,
    TimeBase,
    Track,
    Unsupported,
)
from .core.io import MediaSourceStream

__version__ = "0.1.0"

_PROBE: Optional[Probe] = None
_CODECS: Optional[CodecRegistry] = None


def get_probe() -> Probe:
    """The global format/metadata probe (symphonia/src/lib.rs:225)."""
    global _PROBE
    if _PROBE is None:
        _PROBE = Probe()
        _register_enabled_formats(_PROBE)
    return _PROBE


def get_codecs() -> CodecRegistry:
    """The global codec registry (symphonia/src/lib.rs:215)."""
    global _CODECS
    if _CODECS is None:
        _CODECS = CodecRegistry()
        _register_enabled_codecs(_CODECS)
    return _CODECS


def _register_enabled_formats(probe: Probe) -> None:
    """Register all format readers + metadata readers
    (symphonia/src/lib.rs:234-300 register_enabled_formats)."""
    from .formats import wav

    probe.register(wav.DESCRIPTOR)
    try:
        from .formats import aiff

        probe.register(aiff.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import caf

        probe.register(caf.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import flac as flac_fmt

        probe.register(flac_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import mpa as mpa_fmt

        probe.register(mpa_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import ogg as ogg_fmt

        probe.register(ogg_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import adts as adts_fmt

        probe.register(adts_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import isomp4 as mp4_fmt

        probe.register(mp4_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .formats import mkv as mkv_fmt

        probe.register(mkv_fmt.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .metadata import id3v2 as id3v2_meta

        probe.register(id3v2_meta.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .metadata import id3v1 as id3v1_meta

        probe.register(id3v1_meta.DESCRIPTOR)
    except ImportError:
        pass
    try:
        from .metadata import ape as ape_meta

        probe.register(ape_meta.DESCRIPTOR)
        probe.register(ape_meta.DESCRIPTOR_BEFORE_ID3V1)
    except ImportError:
        pass


def _register_enabled_codecs(registry: CodecRegistry) -> None:
    """Register all decoders (symphonia/src/lib.rs register_enabled_codecs)."""
    from .codecs.pcm import PcmDecoder

    registry.register_audio_decoder(PcmDecoder)
    for mod_name, cls_name in [
        ("adpcm", "AdpcmDecoder"),
        ("flac", "FlacDecoder"),
        ("mpa", "MpaDecoder"),
        ("vorbis", "VorbisDecoder"),
        ("aac", "AacDecoder"),
        ("alac", "AlacDecoder"),
    ]:
        try:
            import importlib

            mod = importlib.import_module(f".codecs.{mod_name}", __package__)
            registry.register_audio_decoder(getattr(mod, cls_name))
        except (ImportError, AttributeError):
            pass
