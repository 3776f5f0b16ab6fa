"""Metadata model: tags, visuals, chapters, revisions.

Analog of symphonia-core/src/meta.rs: ``StandardTag`` (meta.rs:184, ~200
variants — here a string-key namespace), ``RawTag``/``RawValue``
(meta.rs:508,405), ``Visual`` cover art (meta.rs:643), ``Chapter``
(meta.rs:666-703), the ``MetadataLog`` revision queue (meta.rs:847), and
``MetadataOptions`` DoS limits (meta.rs:105).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional


class StandardTagKey:
    """Well-known tag keys (meta.rs:184). A representative subset of the
    ~200-variant enum; values are stable strings."""

    ALBUM = "album"
    ALBUM_ARTIST = "album_artist"
    ARRANGER = "arranger"
    ARTIST = "artist"
    BPM = "bpm"
    COMMENT = "comment"
    COMPILATION = "compilation"
    COMPOSER = "composer"
    CONDUCTOR = "conductor"
    COPYRIGHT = "copyright"
    DATE = "date"
    DESCRIPTION = "description"
    DISC_NUMBER = "disc_number"
    DISC_TOTAL = "disc_total"
    ENCODED_BY = "encoded_by"
    ENCODER = "encoder"
    ENCODER_SETTINGS = "encoder_settings"
    GENRE = "genre"
    GROUPING = "grouping"
    IDENT_ISRC = "ident_isrc"
    IDENT_CATALOG_NUMBER = "ident_catalog_number"
    IDENT_BARCODE = "ident_barcode"
    LABEL = "label"
    LANGUAGE = "language"
    LYRICIST = "lyricist"
    LYRICS = "lyrics"
    MEDIA_FORMAT = "media_format"
    MOOD = "mood"
    MOVEMENT_NAME = "movement_name"
    MOVEMENT_NUMBER = "movement_number"
    MUSICBRAINZ_ALBUM_ID = "musicbrainz_album_id"
    MUSICBRAINZ_ARTIST_ID = "musicbrainz_artist_id"
    MUSICBRAINZ_RECORDING_ID = "musicbrainz_recording_id"
    MUSICBRAINZ_TRACK_ID = "musicbrainz_track_id"
    ORIGINAL_ARTIST = "original_artist"
    ORIGINAL_DATE = "original_date"
    OWNER = "owner"
    PART = "part"
    PERFORMER = "performer"
    PODCAST = "podcast"
    PRODUCER = "producer"
    RATING = "rating"
    RELEASE_DATE = "release_date"
    REMIXER = "remixer"
    REPLAYGAIN_ALBUM_GAIN = "replaygain_album_gain"
    REPLAYGAIN_ALBUM_PEAK = "replaygain_album_peak"
    REPLAYGAIN_TRACK_GAIN = "replaygain_track_gain"
    REPLAYGAIN_TRACK_PEAK = "replaygain_track_peak"
    SORT_ALBUM = "sort_album"
    SORT_ALBUM_ARTIST = "sort_album_artist"
    SORT_ARTIST = "sort_artist"
    SORT_COMPOSER = "sort_composer"
    SORT_TRACK_TITLE = "sort_track_title"
    TRACK_NUMBER = "track_number"
    TRACK_TOTAL = "track_total"
    TRACK_TITLE = "track_title"
    URL = "url"
    URL_ARTIST = "url_artist"
    URL_COPYRIGHT = "url_copyright"
    URL_OFFICIAL = "url_official"
    URL_SOURCE = "url_source"
    VERSION = "version"
    WRITER = "writer"


@dataclass
class RawTag:
    """An unmapped container tag (meta.rs:508): raw key + value, with the
    mapped standard key when known."""

    key: str
    value: Any
    std_key: Optional[str] = None


@dataclass
class Visual:
    """Embedded artwork (meta.rs:643)."""

    media_type: Optional[str]
    data: bytes
    usage: Optional[str] = None  # e.g. 'front_cover'
    dimensions: Optional[tuple] = None
    tags: List[RawTag] = field(default_factory=list)


@dataclass
class Attachment:
    """An attached file, e.g. from Matroska Attachments (meta.rs attachment
    types; mkv demuxer.rs:583-590)."""

    name: Optional[str]
    media_type: Optional[str]
    data: bytes
    description: Optional[str] = None


def sniff_image(data: bytes) -> Optional[str]:
    """Best-effort image MIME sniffing (utils/images.rs:295 analog)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    return None


@dataclass
class Chapter:
    """A chapter marker (meta.rs:666)."""

    start_time: float
    end_time: Optional[float] = None
    title: Optional[str] = None
    tags: List[RawTag] = field(default_factory=list)


@dataclass
class ChapterGroup:
    items: List[Chapter] = field(default_factory=list)
    title: Optional[str] = None


@dataclass
class MetadataRevision:
    """One complete metadata snapshot (meta.rs:727)."""

    tags: List[RawTag] = field(default_factory=list)
    visuals: List[Visual] = field(default_factory=list)
    vendor: Optional[str] = None

    def get(self, std_key: str) -> Optional[Any]:
        for t in self.tags:
            if t.std_key == std_key:
                return t.value
        return None


class MetadataLog:
    """Queue of metadata revisions (meta.rs:847): newer revisions supersede
    older ones; consumers pop outdated revisions as they go."""

    def __init__(self):
        self._revisions: List[MetadataRevision] = []

    def push(self, rev: MetadataRevision) -> None:
        self._revisions.append(rev)

    def current(self) -> Optional[MetadataRevision]:
        return self._revisions[-1] if self._revisions else None

    def skip_to_latest(self) -> Optional[MetadataRevision]:
        if not self._revisions:
            return None
        latest = self._revisions[-1]
        self._revisions = [latest]
        return latest

    def is_empty(self) -> bool:
        return not self._revisions

    def __iter__(self):
        return iter(self._revisions)


@dataclass
class MetadataOptions:
    """DoS limits for metadata parsing (meta.rs:105)."""

    limit_metadata_bytes: int = 16 * 1024 * 1024
    limit_visual_bytes: int = 16 * 1024 * 1024


class MetadataReader:
    """Contract for standalone metadata readers (meta.rs:898): ID3v2, APE,
    ID3v1. Construct over a stream, ``read_all`` to a revision."""

    def __init__(self, options: Optional[MetadataOptions] = None):
        self.options = options or MetadataOptions()

    def read_all(self, reader) -> MetadataRevision:
        raise NotImplementedError
