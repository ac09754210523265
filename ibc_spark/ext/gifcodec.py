"""GIF87a/89a codec — first-principles LZW, pure stdlib + numpy.

The third distinct entropy machine in the media stack (after the DCT/
Huffman JPEG family and the fixed-table RLE/ADPCM codecs): GIF's LZW is
a dictionary coder with variable code width (LSB-first packing,
CLEAR/EOI control codes, the KwKwK corner case, deferred-clear streams).
All deterministic integer machinery, so closable in-sandbox with the
same two-sided discipline: hypothesis round-trips over arbitrary frame
stacks + an oracle entry whose decoded pixels DuckDB re-derives from raw
numbers (the palette is arithmetic, not data). The reference repo has no
media surface (rohankumarrrr/ibc-data-pipelines is sheet-ETL only).

Width-growth convention: the classic compress/giflib discipline — the
encoder checks ``next_free > maxcode`` inside output AFTER writing each
code; the decoder checks the same BEFORE each read (it lags one table
add behind the encoder, which makes the two checks line up; traced in
tests against boundary-crossing streams). Decoder also tolerates
deferred-clear streams (full table, no CLEAR) like real-world encoders
emit.

At 100 TB: same posture as every codec here — Arrow-batched
``mapInPandas`` narrow maps, parallel across documents, per-payload
sequential (inherent to LZW's dictionary recurrence).
"""

from __future__ import annotations

import struct

GIF_TRAILER = 0x3B
GIF_IMAGE_SEP = 0x2C
GIF_EXTENSION = 0x21
GIF_GCE_LABEL = 0xF9

#: GIF interlace passes: (row_start, row_step)
GIF_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


class _LZWBitWriter:
    """LSB-first bit packer (GIF's bit order is the opposite of JPEG's)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> None:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0


def lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, build the string table up to 4096
    (re-CLEAR when full), grow the code width per the classic compress
    check, terminate with EOI. Returns the raw code stream (the caller
    chops it into ≤255-byte sub-blocks)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("GIF min code size must be 2..8")
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LZWBitWriter()
    width = min_code_size + 1
    maxcode = (1 << width) - 1
    nxt = eoi + 1
    table: dict[tuple, int] = {}

    def out(code: int) -> None:
        nonlocal width, maxcode
        bw.write(code, width)
        if nxt > maxcode and width < 12:
            width += 1
            maxcode = (1 << width) - 1

    def code_of(seq: tuple) -> int:
        return seq[0] if len(seq) == 1 else table[seq]

    out(clear)
    pixels = list(indices)
    if not pixels:
        out(eoi)
        bw.flush()
        return bytes(bw.buf)
    w = (int(pixels[0]),)
    for k in pixels[1:]:
        k = int(k)
        if k >= clear:
            raise ValueError("pixel index exceeds min code size alphabet")
        wk = w + (k,)
        if len(wk) > 1 and wk in table:
            w = wk
            continue
        out(code_of(w))
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
        else:
            out(clear)
            table.clear()
            nxt = eoi + 1
            width = min_code_size + 1
            maxcode = (1 << width) - 1
        w = (k,)
    out(code_of(w))
    out(eoi)
    bw.flush()
    return bytes(bw.buf)


def lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Inverse of :func:`lzw_encode`; also accepts wild streams
    (deferred clears, missing EOI at data end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    maxcode = (1 << width) - 1
    nxt = eoi + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        if nxt > maxcode and width < 12:
            width += 1
            maxcode = (1 << width) - 1
        while nbits < width:
            if pos >= len(data):
                return out  # tolerated: stream ended without EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            maxcode = (1 << width) - 1
            nxt = eoi + 1
            del table[eoi + 1 :]
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a literal")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW: code beyond string table")
        out += entry
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
            nxt += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        seg = data[i : i + 255]
        out.append(len(seg))
        out += seg
    out.append(0)
    return bytes(out)


def encode_gif(
    frames_idx,
    palette,
    *,
    delay_cs: int = 4,
    interlace: bool = False,
    transparent: int | None = None,
    bg: int = 0,
) -> bytes:
    """Encode an (N, H, W) uint8 palette-index frame stack + (2^k, 3)
    RGB palette (k in 1..8) as an animated GIF89a: logical screen
    descriptor + global color table, a Graphic Control Extension per
    frame (delay, optional transparency), full-frame image descriptors,
    LZW-compressed index data in sub-blocks, trailer."""
    import numpy as np

    a = np.asarray(frames_idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError("expected (N, H, W) uint8 frame stack")
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) not in (2, 4, 8, 16, 32, 64, 128, 256):
        raise ValueError("palette must be (2^k, 3) uint8, k in 1..8")
    n, h, w = a.shape
    if int(a.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    k = len(pal).bit_length() - 1  # 2^k entries
    min_code = max(2, k)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((k - 1) << 4) | (k - 1), bg, 0])
    out += pal.tobytes()
    for i in range(n):
        flags = 0x01 if transparent is not None else 0x00
        out += bytes([GIF_EXTENSION, GIF_GCE_LABEL, 4, flags])
        out += struct.pack("<H", delay_cs)
        out += bytes([transparent if transparent is not None else 0, 0])
        out += bytes([GIF_IMAGE_SEP])
        out += struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        rows = a[i]
        if interlace:
            order = []
            for start, step in GIF_INTERLACE_PASSES:
                order.extend(range(start, h, step))
            rows = rows[order]
        out += bytes([min_code])
        out += _sub_blocks(lzw_encode(rows.reshape(-1), min_code))
    out.append(GIF_TRAILER)
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode a GIF87a/89a stream → ``(delays_cs, (N, H, W, 3) uint8 RGB
    frame stack)`` of COMPOSITED full-canvas frames: sub-rect images
    draw onto the running canvas, transparent pixels keep what is under
    them, disposal 2 restores the background after the frame, disposal 3
    restores the pre-frame canvas (r15), GIF
    4-pass row interlacing is de-interleaved, local color tables
    override the global one. Other extensions are skipped."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    flags, bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if flags & 0x80:
        ncol = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, ncol * 3, pos).reshape(ncol, 3)
        pos += ncol * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames = []
    delays = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == GIF_TRAILER:
            break
        if b == GIF_EXTENSION:
            label = payload[pos]
            pos += 1
            if label == GIF_GCE_LABEL:
                size = payload[pos]
                gflags = payload[pos + 1]
                (delay,) = struct.unpack_from("<H", payload, pos + 2)
                transparent = payload[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 1 + size + 1  # size byte + body + terminator
            else:  # skip any other extension's sub-blocks
                while True:
                    size = payload[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            continue
        if b != GIF_IMAGE_SEP:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        iflags = payload[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            ncol = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, ncol * 3, pos).reshape(ncol, 3)
            pos += ncol * 3
        if pal is None:
            raise ValueError("GIF image without any color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            lzw += payload[pos : pos + size]
            pos += size
        idx = np.frombuffer(
            bytes(lzw_decode(bytes(lzw), min_code)), np.uint8, iw * ih
        ).reshape(ih, iw)
        if iflags & 0x40:  # de-interlace rows
            out_rows = np.zeros_like(idx)
            src = 0
            for start, step in GIF_INTERLACE_PASSES:
                cnt = len(range(start, ih, step))
                out_rows[start::step] = idx[src : src + cnt]
                src += cnt
            idx = out_rows
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of range")
        region = canvas[top : top + ih, left : left + iw]
        # disposal 3 = restore-to-previous: snapshot the pre-frame region
        # so the next frame composites onto what was there BEFORE this
        # one (ADVICE r14 — was silently treated as 'none')
        prev_region = region.copy() if disposal == 3 else None
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2 and gct is not None and bg < len(gct):
            canvas[top : top + ih, left : left + iw] = gct[bg]
        elif disposal == 3 and prev_region is not None:
            canvas[top : top + ih, left : left + iw] = prev_region
        transparent = None
        disposal = 0
        delay = 0
    return delays, (
        np.stack(frames) if frames else np.zeros((0, h, w, 3), dtype=np.uint8)
    )
