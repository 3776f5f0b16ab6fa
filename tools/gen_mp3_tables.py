"""Generate symphonia_tpu/data/mp3_tables.npz.

The MP3 decode constants are ISO/IEC 11172-3 / 13818-3 specification *data*
(Annex B tables: Huffman codebooks B.7, scalefactor bands B.8, synthesis
window B.3, bitrate tables) that every independent decoder embeds
byte-identically. This script parses those numeric tables out of the
reference's source (symphonia-bundle-mp3) — data only, no code — and stores
them as numpy arrays. Rerunnable; the .npz is committed so the build has no
runtime dependency on the reference checkout.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/symphonia-bundle-mp3/src")


def strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    return text


def parse_array(src: str, name: str, dtype=np.int64) -> np.ndarray:
    """Parse `NAME: <ty> = [ ... ];` (possibly nested) into a flat array."""
    m = re.search(rf"{name}\s*:[^=]*=\s*\[", src)
    if not m:
        raise KeyError(name)
    # Bracket-match from the opening '['.
    start = m.end() - 1
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "[":
            depth += 1
        elif src[i] == "]":
            depth -= 1
            if depth == 0:
                end = i
                break
    else:
        raise ValueError(f"unterminated array {name}")
    body = strip_comments(src[start + 1 : end])
    toks = [t for t in re.split(r"[,\s\[\]]+", body) if t]
    vals = []
    for t in toks:
        if not t.startswith("0x"):
            t = re.sub(r"(f32|f64)$", "", t)
        vals.append(int(t, 16) if t.startswith("0x") else float(t))
    return np.asarray(vals, dtype=dtype)


def parse_nested_usize(src: str, name: str, shape) -> np.ndarray:
    return parse_array(src, name, dtype=np.int64).reshape(shape)


def build_mp3_tables() -> dict:
    """Re-extract the MP3 table set from the reference source. Pure
    function of the reference checkout: the spec-regeneration test
    (tests/test_table_regen.py) asserts the committed npz equals a fresh
    build, so a perturbed shipped table fails CI."""
    out = {}

    cb = (REF / "layer3" / "codebooks.rs").read_text()
    for n in [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]:
        out[f"codes_{n}"] = parse_array(cb, f"MPEG_CODES_{n}").astype(np.uint32)
        out[f"bits_{n}"] = parse_array(cb, f"MPEG_BITS_{n}").astype(np.uint8)
    out["quads_codes_a"] = parse_array(cb, "MPEG_QUADS_CODES_A").astype(np.uint32)
    out["quads_bits_a"] = parse_array(cb, "MPEG_QUADS_BITS_A").astype(np.uint8)
    out["quads_codes_b"] = parse_array(cb, "MPEG_QUADS_CODES_B").astype(np.uint32)
    out["quads_bits_b"] = parse_array(cb, "MPEG_QUADS_BITS_B").astype(np.uint8)
    out["linbits"] = parse_array(cb, "CODEBOOK_LINBITS").astype(np.int32)

    common = (REF / "layer3" / "common.rs").read_text()
    out["sfb_long"] = parse_nested_usize(common, "SFB_LONG_BANDS", (9, 23)).astype(np.int32)
    out["sfb_short"] = parse_nested_usize(common, "SFB_SHORT_BANDS", (9, 40)).astype(np.int32)
    out["sfb_mixed_switch"] = parse_array(common, "SFB_MIXED_SWITCH_POINT").astype(np.int32)
    # SFB_MIXED_BANDS is ragged (&[..] slices); parse each block.
    m = re.search(r"SFB_MIXED_BANDS[^=]*=\s*\[(.*?)\n\];", common, re.DOTALL)
    blocks = re.findall(r"&\[(.*?)\]", strip_comments(m.group(1)), re.DOTALL)
    assert len(blocks) == 9, len(blocks)
    for i, b in enumerate(blocks):
        vals = [int(t) for t in re.split(r"[,\s]+", b) if t]
        out[f"sfb_mixed_{i}"] = np.asarray(vals, dtype=np.int32)

    bs = (REF / "layer3" / "bitstream.rs").read_text()
    m = re.search(r"SCALE_FACTOR_SLEN[^=]*=\s*\[(.*?)\];", bs, re.DOTALL)
    pairs = re.findall(r"\((\d+)\s*,\s*(\d+)\)", strip_comments(m.group(1)))
    out["slen"] = np.asarray([[int(a), int(b)] for a, b in pairs], dtype=np.int32)
    m = re.search(r"SCALE_FACTOR_MPEG2_NSFB[^=]*=\s*\[(.*?)\n\];", bs, re.DOTALL)
    vals = [int(t) for t in re.split(r"[,\s\[\]]+", strip_comments(m.group(1))) if t]
    out["mpeg2_nsfb"] = np.asarray(vals, dtype=np.int32).reshape(6, 3, 4)

    syn = (REF / "synthesis.rs").read_text()
    out["synthesis_d"] = parse_array(syn, "SYNTHESIS_D", dtype=np.float64).astype(np.float32)

    hdr = (REF / "header.rs").read_text()
    for name in ["BIT_RATES_MPEG1_L1", "BIT_RATES_MPEG1_L2", "BIT_RATES_MPEG1_L3",
                 "BIT_RATES_MPEG2_L1", "BIT_RATES_MPEG2_L23"]:
        out[name.lower()] = parse_array(hdr, name).astype(np.int64)

    l12 = (REF / "layer12.rs").read_text()
    out["layer12_scalefactors"] = parse_array(
        l12, "LAYER12_SCALEFACTORS", dtype=np.float64
    ).astype(np.float32)

    # Spot-check invariants.
    assert out["sfb_long"][0, -1] == 576
    assert out["synthesis_d"].shape == (512,)
    assert abs(out["synthesis_d"][1] + 0.000015259) < 1e-9
    assert out["layer12_scalefactors"][0] == 2.0
    return out


def main() -> None:
    out = build_mp3_tables()
    dst = Path(__file__).resolve().parent.parent / "symphonia_tpu" / "data" / "mp3_tables.npz"
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} with {len(out)} arrays")


if __name__ == "__main__":
    main()


def build_vorbis_tables() -> dict:
    """Re-extract the floor1 inverse-dB table (Vorbis I spec §10.1 data)."""
    src = Path("/root/reference/symphonia-codec-vorbis/src/floor.rs").read_text()
    table = parse_array(src, "FLOOR1_INVERSE_DB_TABLE", dtype=np.float64)
    assert table.shape == (256,)
    return {"floor1_inverse_db": table.astype(np.float32)}


def gen_vorbis_tables() -> None:
    """Write symphonia_tpu/data/vorbis_tables.npz."""
    dst = Path(__file__).resolve().parent.parent / "symphonia_tpu" / "data" / "vorbis_tables.npz"
    np.savez_compressed(dst, **build_vorbis_tables())
    print(f"wrote {dst}")


def build_aac_tables() -> dict:
    """Re-extract AAC constant tables (ISO/IEC 13818-7 / 14496-3 data):
    spectrum Huffman codebooks 1-11, scalefactor codebook, and the
    scalefactor-band (swb) offset tables."""
    refdir = Path("/root/reference/symphonia-codec-aac/src/aac")
    cb = (refdir / "codebooks.rs").read_text()
    out = {}
    for n in range(1, 12):
        out[f"spec_codes_{n}"] = parse_array(cb, f"SPECTRUM_CODEBOOK{n}_CODES").astype(np.uint32)
        out[f"spec_lens_{n}"] = parse_array(cb, f"SPECTRUM_CODEBOOK{n}_LENS").astype(np.uint8)
    out["scf_codes"] = parse_array(cb, "SCF_CODEBOOK_CODES").astype(np.uint32)
    out["scf_lens"] = parse_array(cb, "SCF_CODEBOOK_LENS").astype(np.uint8)

    common = (refdir / "common.rs").read_text()
    for name in ["96K_LONG", "64K_LONG", "48K_LONG", "48K_SHORT", "32K_LONG",
                 "24K_LONG", "24K_SHORT", "16K_LONG", "16K_SHORT", "8K_LONG",
                 "8K_SHORT", "64K_SHORT"]:
        out[f"swb_{name.lower()}"] = parse_array(common, f"SWB_OFFSET_{name}").astype(np.int32)

    assert len(out["spec_codes_11"]) == 289
    assert out["swb_48k_long"][-1] == 1024
    return out


def gen_aac_tables() -> None:
    """Write symphonia_tpu/data/aac_tables.npz."""
    dst = Path(__file__).resolve().parent.parent / "symphonia_tpu" / "data" / "aac_tables.npz"
    out = build_aac_tables()
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} with {len(out)} arrays")


def build_mp3_native_header_text() -> str:
    """Render native/mp3_tables.h's contents from the shipped npz (the
    C++ entropy stage's compiled-in copy of the same tables)."""
    src = Path(__file__).resolve().parent.parent / "symphonia_tpu" / "data" / "mp3_tables.npz"
    d = dict(np.load(src))
    out = ["// Generated by tools/gen_mp3_tables.py from mp3_tables.npz.",
           "// ISO/IEC 11172-3 / 13818-3 specification data.",
           "#pragma once", "#include <cstdint>", ""]

    def emit(name, arr, ctype):
        flat = np.asarray(arr).reshape(-1)
        vals = ", ".join(str(int(v)) for v in flat)
        out.append(f"static const {ctype} {name}[{len(flat)}] = {{{vals}}};")

    for n in [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]:
        emit(f"kCodes{n}", d[f"codes_{n}"], "uint32_t")
        emit(f"kBits{n}", d[f"bits_{n}"], "uint8_t")
    emit("kQuadsCodesA", d["quads_codes_a"], "uint32_t")
    emit("kQuadsBitsA", d["quads_bits_a"], "uint8_t")
    emit("kQuadsCodesB", d["quads_codes_b"], "uint32_t")
    emit("kQuadsBitsB", d["quads_bits_b"], "uint8_t")
    emit("kLinbits", d["linbits"], "int32_t")
    emit("kSfbLong", d["sfb_long"], "int32_t")        # [9][23]
    emit("kSfbShort", d["sfb_short"], "int32_t")      # [9][40]
    emit("kSfbMixedSwitch", d["sfb_mixed_switch"], "int32_t")
    for i in range(9):
        emit(f"kSfbMixed{i}", d[f"sfb_mixed_{i}"], "int32_t")
    out.append("static const int32_t* kSfbMixed[9] = {" + ", ".join(
        f"kSfbMixed{i}" for i in range(9)) + "};")
    out.append("static const int32_t kSfbMixedLen[9] = {" + ", ".join(
        str(len(d[f"sfb_mixed_{i}"])) for i in range(9)) + "};")
    emit("kSlen", d["slen"], "int32_t")               # [16][2]
    emit("kNsfb", d["mpeg2_nsfb"], "int32_t")          # [6][3][4]
    for name in ["bit_rates_mpeg1_l1", "bit_rates_mpeg1_l2", "bit_rates_mpeg1_l3",
                 "bit_rates_mpeg2_l1", "bit_rates_mpeg2_l23"]:
        emit("k" + "".join(w.capitalize() for w in name.split("_")), d[name], "int64_t")
    return "\n".join(out) + "\n"


def gen_mp3_native_header() -> None:
    """Write native/mp3_tables.h."""
    dst = Path(__file__).resolve().parent.parent / "native" / "mp3_tables.h"
    dst.write_text(build_mp3_native_header_text())
    print(f"wrote {dst}")
