"""Baseline TIFF codec — IFD container + LZW/PackBits, pure stdlib+numpy.

TIFF is the remaining big *container* format in real image corpora
(scans, scientific imagery, multi-page docs). Everything baseline TIFF
needs is deterministic integer machinery: the IFD tag walk, PackBits
(fixed-table RLE, the BMP-RLE8 class), and TIFF-variant LZW — the GIF
dictionary coder with three twists (MSB-first bit packing, a fixed
256-symbol alphabet with CLEAR=256/EOI=257, and the "early change"
convention where the code width grows ONE CODE EARLIER than GIF's).
Same two-sided discipline as the other codecs: hypothesis round-trips
+ an oracle entry over lossless content. Reference repo has no media
surface (rohankumarrrr/ibc-data-pipelines is sheet ETL).

Scope: 8-bit grayscale and RGB, single- or multi-strip, compression
none (1) / LZW (5) / PackBits (32773), optional horizontal-differencing
predictor (tag 317 = 2), both byte orders on decode (writer emits
little-endian). Tiled TIFF, 16-bit, YCbCr/JPEG-in-TIFF stay the loud
seam.

At 100 TB: Arrow-batched ``mapInPandas`` narrow maps, parallel across
documents; strips decode independently (the format's own parallelism
hook), per-strip LZW sequential as inherent to dictionary coding.
"""

from __future__ import annotations

import struct

TIFF_CLEAR = 256
TIFF_EOI = 257

# tag ids
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP = 262, 273, 277, 278
_T_STRIP_CNT, _T_PLANAR, _T_PREDICTOR = 279, 284, 317


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits: runs of ≥2 identical bytes → (257-n, byte); literal
    stretches → (n-1, bytes); -128 is a no-op the decoder skips."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1) & 0xFF)
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch up to the next run of >= 3 (2-byte runs are
        # cheaper inside a literal) or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:  # literal n+1
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[i : i + n + 1]
            i += n + 1
        elif n == 128:  # no-op
            continue
        else:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits output overruns the strip size")
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: 256-symbol alphabet, MSB-first packing, CLEAR
    emitted first and on table-full, EARLY CHANGE (width grows when the
    next free code is 2^width − 1, one code earlier than GIF)."""
    out = bytearray()
    acc = 0
    nbits = 0

    width = 9
    nxt = TIFF_EOI + 1
    table: dict[bytes, int] = {}

    def put(code: int) -> None:
        nonlocal acc, nbits, width
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1
        # early change: grow once the NEXT code to assign hits 2^width - 1
        if nxt >= (1 << width) - 1 and width < 12:
            width += 1

    put(TIFF_CLEAR)
    if not data:
        put(TIFF_EOI)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)
    w = data[0:1]
    for i in range(1, len(data)):
        k = data[i : i + 1]
        wk = w + k
        if len(wk) > 1 and wk in table:
            w = wk
            continue
        put(w[0] if len(w) == 1 else table[w])
        if nxt < 4094:  # leave room before the width-12 ceiling
            table[wk] = nxt
            nxt += 1
        else:
            put(TIFF_CLEAR)
            table.clear()
            nxt = TIFF_EOI + 1
            width = 9
        w = k
    put(w[0] if len(w) == 1 else table[w])
    put(TIFF_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`tiff_lzw_encode` (early-change convention)."""
    out = bytearray()
    width = 9
    nxt = TIFF_EOI + 1
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == TIFF_CLEAR:
            width = 9
            nxt = TIFF_EOI + 1
            del table[TIFF_EOI + 1 :]
            prev = None
            continue
        if code == TIFF_EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: first code not a literal")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW: code beyond string table")
        out += entry
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
            nxt += 1
        prev = entry
        if nxt >= (1 << width) - 1 and width < 12:  # early change
            width += 1
    if len(out) != expected:
        raise ValueError("TIFF LZW output does not match the strip size")
    return bytes(out)


def _predict_encode(rows, spp: int):
    """Horizontal differencing (predictor 2): store per-row byte deltas."""
    import numpy as np

    p = rows.astype(np.int32)
    d = p.copy()
    d[:, spp:] = p[:, spp:] - p[:, :-spp]
    return (d & 0xFF).astype(np.uint8)


def _predict_decode(rows, spp: int):
    import numpy as np

    out = rows.astype(np.int32)
    for c in range(spp, out.shape[1], spp):
        out[:, c : c + spp] = (out[:, c : c + spp] + out[:, c - spp : c]) & 0xFF
    return out.astype(np.uint8)


_COMP_CODES = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(
    arr,
    *,
    compression: str = "lzw",
    predictor: bool = False,
    rows_per_strip: int = 8,
) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W) grayscale uint8 array as a
    little-endian baseline TIFF with the chosen strip compression."""
    import numpy as np

    if compression not in _COMP_CODES:
        raise ValueError("compression must be none/lzw/packbits")
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (H, W, 3) RGB or (H, W) grayscale uint8 array")
    if predictor and compression == "none":
        raise ValueError("predictor only applies to compressed strips")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    flat = a.reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = flat[y0 : y0 + rows_per_strip]
        if predictor:
            rows = _predict_encode(rows, spp)
        raw = rows.tobytes()
        if compression == "lzw":
            strips.append(tiff_lzw_encode(raw))
        elif compression == "packbits":
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)

    n_strips = len(strips)
    # layout: header(8) | IFD | [offset arrays] | strip data
    tags = []  # (tag, type, count, value_or_offset_placeholder)

    def short_or_long_array(values):
        return values  # resolved below

    entries = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BITS, 3, spp, [8] * spp),
        (_T_COMP, 3, 1, _COMP_CODES[compression]),
        (_T_PHOTO, 3, 1, 1 if gray else 2),
        (_T_STRIP_OFF, 4, n_strips, None),  # filled below
        (_T_SPP, 3, 1, spp),
        (_T_ROWS_PER_STRIP, 3, 1, rows_per_strip),
        (_T_STRIP_CNT, 4, n_strips, [len(s) for s in strips]),
        (_T_PLANAR, 3, 1, 1),
    ]
    if predictor:
        entries.append((_T_PREDICTOR, 3, 1, 2))
        entries.sort()

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def value_bytes(ttype, count, val):
        fmt = {3: "<H", 4: "<I"}[ttype]
        vals = val if isinstance(val, list) else [val]
        return b"".join(struct.pack(fmt, v) for v in vals)

    # first pass: compute where out-of-line arrays and strip data land
    resolved = []
    strip_off_reservation = None  # position inside `extra` when out-of-line
    for tag, ttype, count, val in entries:
        size = {3: 2, 4: 4}[ttype] * count
        if tag == _T_STRIP_OFF:
            resolved.append([tag, ttype, count, None, size > 4])
            if size > 4:
                strip_off_reservation = len(extra)
                extra.extend(b"\x00" * size)
            continue
        vb = value_bytes(ttype, count, val)
        if size <= 4:
            resolved.append([tag, ttype, count, vb.ljust(4, b"\x00"), False])
        else:
            resolved.append([tag, ttype, count, struct.pack("<I", extra_off + len(extra)), False])
            extra.extend(vb)
    data_off = extra_off + len(extra)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # fill strip offsets
    off_bytes = value_bytes(4, n_strips, offsets)
    for r in resolved:
        if r[0] == _T_STRIP_OFF:
            if r[4]:  # out-of-line
                extra[strip_off_reservation : strip_off_reservation + 4 * n_strips] = off_bytes
                r[3] = struct.pack("<I", extra_off + strip_off_reservation)
            else:
                r[3] = off_bytes.ljust(4, b"\x00")

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, ttype, count, vb, _ool in resolved:
        out += struct.pack("<HHI", tag, ttype, count) + vb
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF (first IFD) → (H, W, 3) uint8 RGB (grayscale
    replicates). Handles both byte orders, strip compression 1/5/32773,
    horizontal-differencing predictor, multi-strip images."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(bo + "HHI", payload, base)
        if ttype not in type_size:
            continue  # rationals etc. — not needed for the pixel path
        size = type_size[ttype] * count
        off = base + 8 if size <= 4 else struct.unpack_from(bo + "I", payload, base + 8)[0]
        tags[tag] = list(
            struct.unpack_from(bo + str(count) + type_fmt[ttype], payload, off)
        )
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offs = tags[_T_STRIP_OFF]
        cnts = tags[_T_STRIP_CNT]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag: {exc}") from exc
    comp = tags.get(_T_COMP, [1])[0]
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if any(b != 8 for b in bits) or spp not in (1, 3) or planar != 1:
        raise NotImplementedError("only 8-bit chunky gray/RGB TIFF supported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")

    rows_out = np.zeros((h, w * spp), dtype=np.uint8)
    y = 0
    for off, cnt in zip(offs, cnts):
        nrows = min(rps, h - y)
        expected = nrows * w * spp
        raw = payload[off : off + cnt]
        if comp == 5:
            raw = tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            raw = packbits_decode(raw, expected)
        elif len(raw) < expected:
            raise ValueError("TIFF strip shorter than its pixel span")
        rows = np.frombuffer(raw, np.uint8, expected).reshape(nrows, w * spp)
        if predictor == 2:
            rows = _predict_decode(rows, spp)
        rows_out[y : y + nrows] = rows
        y += nrows
    if y != h:
        raise ValueError("TIFF strips do not cover the image height")
    if spp == 1:
        return np.repeat(rows_out[:, :, None], 3, axis=2)
    return rows_out.reshape(h, w, 3).copy()
