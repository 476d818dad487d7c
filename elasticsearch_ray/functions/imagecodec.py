"""Dependency-free image / video codecs for the multimodal stages.

The container ships no image libraries (no Pillow, no ffmpeg), but a
training-data engine can't leave its decode path untested — so the strict
multimodal stages are backed by pure numpy+zlib implementations of PUBLIC
formats:

- PNG (RFC 2083 / W3C PNG spec): 8-bit gray / gray+alpha / RGB / RGBA /
  palette, non-interlaced, all five scanline filters (None/Sub/Up/
  Average/Paeth) on both encode and decode.
- BMP (BITMAPINFOHEADER): uncompressed 24-bit BI_RGB and 8-bit palette.
- YUV4MPEG2 ("Y4M", the mjpegtools uncompressed video interchange
  format): plain-text stream header + ``FRAME`` markers over raw planar
  frames; ``C420``/``C420jpeg``/``C420mpeg2``/``C422``/``C444``/``Cmono``.

When Pillow IS importable the multimodal stages prefer it (it is the
faster, battle-tested codec); these functions are the guaranteed-present
fallback so ``mode='strict'`` always runs a REAL decode.

Reference behavior: the reference repo has no multimodal path at all —
this module exists for the SURVEY's training-data-pipeline axis, not for
reference parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color types -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a scanline (int16 inputs)."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out


# ---------------------------------------------------------------------------
# PNG


def png_encode(
    arr: np.ndarray,
    palette: np.ndarray | None = None,
    filters: list[int] | int | None = 0,
) -> bytes:
    """Encode a uint8 array as an 8-bit non-interlaced PNG.

    ``arr`` is ``(H, W)`` (grayscale, or palette indices when ``palette``
    — an ``(N, 3)`` uint8 array — is given) or ``(H, W, C)`` with C in
    {2: gray+alpha, 3: RGB, 4: RGBA}.  ``filters`` selects the scanline
    filter: one type for every row, a per-row list, or None for the
    fixed cycle 0,1,2,3,4,0,... (exercises every filter in tests).
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color = 3 if palette is not None else 0
        h, w = arr.shape
        ch = 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        h, w, ch = arr.shape
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    flat = arr.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    if filters is None:
        frow = [i % 5 for i in range(h)]
    elif isinstance(filters, int):
        frow = [filters] * h
    else:
        frow = list(filters)
        if len(frow) != h:
            raise ValueError("per-row filter list must have H entries")
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        ft = frow[y]
        left = np.zeros(stride, dtype=np.int16)
        left[ch:] = row[:-ch]
        upleft = np.zeros(stride, dtype=np.int16)
        upleft[ch:] = prev[:-ch]
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - (left + prev) // 2
        elif ft == 4:
            enc = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter type {ft}")
        raw.append(ft)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color == 3:
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("palette must be (N<=256, 3) uint8")
        out += chunk(b"PLTE", pal.tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += chunk(b"IEND", b"")
    return out


def png_decode(data: bytes, expand_palette: bool = True) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 array: ``(H, W)``
    for grayscale, ``(H, W, C)`` otherwise (palette images expand to RGB
    unless ``expand_palette=False``, which returns the raw indices)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = color = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth={depth})")
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"bad color type {color}")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data has wrong length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    scan = rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = int(ftypes[y])
        row = scan[y]
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) & 0xFF
        elif ft == 1:
            # Sub is a per-channel mod-256 prefix sum — vectorized
            cur = np.empty(stride, dtype=np.int16)
            for c in range(ch):
                cur[c::ch] = np.cumsum(row[c::ch], dtype=np.int64) & 0xFF
        elif ft in (3, 4):
            # Average/Paeth recurrences are sequential in x; plain-int
            # scanline loops beat per-pixel numpy slicing by ~50x and the
            # fallback only runs where Pillow is absent
            rl = row.tolist()
            pl = prev.tolist()
            cl = [0] * stride
            if ft == 3:
                for x in range(stride):
                    a = cl[x - ch] if x >= ch else 0
                    cl[x] = (rl[x] + ((a + pl[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = cl[x - ch] if x >= ch else 0
                    c = pl[x - ch] if x >= ch else 0
                    b = pl[x]
                    p = a + b - c
                    pa_ = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc_ = p - c if p >= c else c - p
                    if pa_ <= pb and pa_ <= pc_:
                        pred = a
                    elif pb <= pc_:
                        pred = b
                    else:
                        pred = c
                    cl[x] = (rl[x] + pred) & 0xFF
            cur = np.array(cl, dtype=np.int16)
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8)
    if color == 0:
        return px.reshape(h, w)
    if color == 3:
        idx = px.reshape(h, w)
        if not expand_palette:
            return idx
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[idx]
    return px.reshape(h, w, ch)


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, bottom-up, BI_RGB)


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode ``(H, W)`` uint8 (8-bit gray palette) or ``(H, W, 3)`` RGB
    as an uncompressed bottom-up BMP."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        bpp, pal_n = 8, 256
        # grayscale ramp palette
        ramp = np.arange(256, dtype=np.uint8)
        pal = np.stack([ramp, ramp, ramp, np.zeros(256, np.uint8)], 1)
        row_bytes = w
        rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        bpp, pal_n, pal = 24, 0, None
        row_bytes = w * 3
        rows = arr[:, :, ::-1].reshape(h, row_bytes)  # RGB -> BGR
    else:
        raise ValueError(f"unsupported BMP shape {arr.shape}")
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rows[y].tobytes() + b"\x00" * pad
    pal_bytes = pal.tobytes() if pal is not None else b""
    off = 14 + 40 + len(pal_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(body), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835, pal_n, 0
    )
    return header + pal_bytes + bytes(body)


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an uncompressed BITMAPINFOHEADER BMP: 8-bit palette ->
    ``(H, W, 3)`` (or ``(H, W)`` when the palette is a pure gray ramp),
    24-bit -> ``(H, W, 3)`` RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hsize, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if hsize < 40 or comp != 0:
        raise ValueError("only uncompressed BITMAPINFOHEADER BMPs supported")
    flip = h > 0
    h = abs(h)
    if bpp == 24:
        row_bytes = w * 3
    elif bpp == 8:
        row_bytes = w
        (pal_n,) = struct.unpack("<I", data[46:50])
        pal_n = pal_n or 256
        pal = np.frombuffer(
            data[14 + hsize : 14 + hsize + 4 * pal_n], dtype=np.uint8
        ).reshape(-1, 4)[:, 2::-1]  # BGRA -> RGB
    else:
        raise ValueError(f"unsupported BMP bpp={bpp}")
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.frombuffer(
        data[off : off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, :row_bytes]
    if flip:
        px = px[::-1]
    if bpp == 24:
        return px.reshape(h, w, 3)[:, :, ::-1].copy()  # BGR -> RGB
    idx = px.reshape(h, w)
    if len(pal) == 256 and (pal == pal[:, :1]).all() and (
        pal[:, 0] == np.arange(256)
    ).all():
        return idx.copy()  # gray ramp -> grayscale
    return pal[idx]


# ---------------------------------------------------------------------------
# dispatch


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the container magic and decode: PNG or BMP -> uint8 array."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    raise ValueError("unknown image format (expected PNG or BMP magic)")


def to_gray(arr: np.ndarray) -> np.ndarray:
    """Collapse an image array to ``(H, W)`` uint8 luma (ITU-R BT.601,
    the same integer-free weights Pillow's ``convert('L')`` uses)."""
    if arr.ndim == 2:
        return arr
    if arr.shape[2] < 3:
        # gray (H,W,1) or gray+alpha (H,W,2) — luma IS channel 0
        return np.ascontiguousarray(arr[:, :, 0])
    rgb = arr[:, :, :3].astype(np.float64)
    return (
        rgb[:, :, 0] * 299 / 1000
        + rgb[:, :, 1] * 587 / 1000
        + rgb[:, :, 2] * 114 / 1000
    ).astype(np.uint8)


def resize_area(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Box / area-average resize of a ``(H, W)`` uint8 image to
    ``(th, tw)`` — the deterministic fallback resampler (Pillow, when
    present, uses its own kernels; parity between the two is NOT claimed)."""
    h, w = arr.shape
    # per-block source ranges [b0, b1): when upscaling, boundaries
    # collide — widen each zero-width block to one source pixel (a
    # zero-width column would otherwise integrate to 0 -> black), with
    # b0 = i*src//dst guaranteeing b1 = b0+1 <= src stays in bounds
    x0s = np.arange(tw, dtype=np.int64) * w // tw
    x1s = np.maximum(x0s + 1, np.arange(1, tw + 1, dtype=np.int64) * w // tw)
    y0s = np.arange(th, dtype=np.int64) * h // th
    y1s = np.maximum(y0s + 1, np.arange(1, th + 1, dtype=np.int64) * h // th)
    csum = np.zeros((h + 1, w + 1), dtype=np.int64)
    csum[1:, 1:] = arr.astype(np.int64).cumsum(0).cumsum(1)
    out = np.empty((th, tw), dtype=np.uint8)
    for i in range(th):
        y0, y1 = y0s[i], y1s[i]
        block = (
            csum[y1, x1s] - csum[y0, x1s]
            - csum[y1, x0s] + csum[y0, x0s]
        )
        area = (y1 - y0) * (x1s - x0s)
        out[i] = (block // area).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# YUV4MPEG2 (Y4M)

_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_CHROMA_DIV = {
    # chroma tag -> (x_div, y_div) for the U/V planes; mono has none
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "422": (2, 1), "444": (1, 1),
}


def y4m_encode(frames: np.ndarray, chroma: str = "mono",
               fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode ``(N, H, W)`` uint8 luma frames as a YUV4MPEG2 stream
    (``Cmono``, or constant-128 chroma planes for ``C420``/``C422``/
    ``C444``)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = bytearray(hdr.encode("ascii"))
    if chroma == "mono":
        cbytes = b""
    else:
        dx, dy = _Y4M_CHROMA_DIV[chroma]
        cbytes = b"\x80" * (2 * (w // dx) * (h // dy))
    for i in range(n):
        out += b"FRAME\n" + frames[i].tobytes() + cbytes
    return bytes(out)


def y4m_parse(data: bytes) -> tuple[dict, list[np.ndarray]]:
    """Parse a YUV4MPEG2 stream: returns the stream parameters and the
    luma (Y) plane of every frame as ``(H, W)`` uint8 arrays.  Chroma
    planes are skipped, not decoded — frame sampling and thumbnailing
    only need luma."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    params: dict = {"chroma": "420"}  # Y4M default when C is absent
    for tok in data[len(_Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            params["width"] = int(t[1:])
        elif t[0] == "H":
            params["height"] = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            params["fps"] = (int(num), int(den))
        elif t[0] == "C":
            params["chroma"] = t[1:]
    w, h = params.get("width"), params.get("height")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    chroma = params["chroma"]
    ysize = w * h
    if chroma == "mono":
        csize = 0
    else:
        try:
            dx, dy = _Y4M_CHROMA_DIV[chroma]
        except KeyError:
            raise ValueError(f"unsupported Y4M chroma {chroma!r}")
        csize = 2 * (w // dx) * (h // dy)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        pos = fnl + 1
        if pos + ysize + csize > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data[pos : pos + ysize], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
        pos += ysize + csize
    return params, frames
