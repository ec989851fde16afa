"""REAL baseline JPEG codec — pure stdlib + numpy, no Pillow.

This closes the multimodal family's last stub (the reference's one
binary column is ``staff.picture``, ``sql/sakila-schema.sql:317``; the
engine generalizes it to arbitrary media payloads): a full
SOF0/baseline decoder — marker walk, DQT/DHT/DRI/SOS parsing, canonical
Huffman code construction from the file's OWN table segments, bit-level
entropy decoding with byte-unstuffing and restart-marker handling, DC
prediction, dequantization, zigzag reordering, and a numpy IDCT — plus
the encoder twin used to synthesize genuine test containers.

Scope (documented, enforced with ``ValueError``): baseline DCT (SOF0),
8-bit samples, grayscale or color with sampling factors in {1, 2} —
4:4:4, 4:2:0 (the dominant real-world layout), 4:2:2 and 4:4:0 all
decode, chroma planes upsampled by sample replication; the encoder
twin synthesizes genuinely subsampled containers so the interleaved
multi-block MCU walk and the upsample path sit under real entropy
bytes. Single interleaved scan; progressive files are detected by the
header tier (``multimodal.decode_jpeg_header``) and rejected here.

Exactness discipline: DCT/IDCT are lossy in general, so the registered
driver-hash entry synthesizes images whose 8x8 blocks are UNIFORM with
a flat quantization table of 8s — for a constant block the only
nonzero coefficient is DC = 8*(v-128), quantization divides it by 8
exactly, and the IDCT reproduces v to within float epsilon, so decoded
pixels are bit-exact and the DuckDB oracle can recompute them
arithmetically. Lossy general-content roundtrips (AC coefficients,
gradients, color) are pytest territory with an error tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

#: JPEG zigzag scan order: zigzag index -> natural (row-major) index.
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

#: 8x8 DCT-II basis (orthonormal): row u, col x = C(u)/2 * cos((2x+1)uπ/16).
_DCT_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT of one 8x8 spatial block (level-shifted)."""
    return _DCT_M @ block @ _DCT_M.T


def _idct(coeffs: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT of one 8x8 coefficient block."""
    return _DCT_M.T @ coeffs @ _DCT_M


def _build_canonical_codes(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """JPEG Annex C canonical Huffman construction: ``bits[l]`` symbols
    of length l+1, assigned increasing code values — returns
    {(length, code): symbol}."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT: counts exceed symbol list")
            codes[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte_i = self.pos >> 3
        if byte_i >= len(self.data):
            raise ValueError("entropy data exhausted")
        bit = (self.data[byte_i] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, codes: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = codes.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded stream starting at ``pos``: 0xFF00 ->
    0xFF data byte, RST0-7 markers split segments (DC prediction resets
    there), any other marker ends the scan. Returns (segments, pos of
    the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    while pos < len(payload):
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= len(payload):
            raise ValueError("truncated entropy stream")
        m = payload[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next segment: scan is over
            segs.append(bytes(cur))
            return segs, pos
    raise ValueError("entropy stream ran off the container end")


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG to pixel facts: dimensions, channel
    count, exact integer channel means of the decoded samples (Y for
    grayscale, R/G/B via ITU YCbCr conversion for color), and the
    top-left sample. Raises ``ValueError`` on malformed or
    out-of-scope containers (progressive, subsampled, 12-bit)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG container")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) with comps = [(cid, tq)]
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("segment desync (expected marker)")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            raise ValueError("truncated segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT: one or more (Pq/Tq, 64 entries) tables
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if off + 65 > len(body):
                    raise ValueError("truncated DQT")
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = body[off + 1 + i]
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT: one or more Huffman tables
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                if off + 17 > len(body):
                    raise ValueError("truncated DHT")
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = body[off + 17 : off + 17 + n]
                if len(vals) < n:
                    raise ValueError("truncated DHT symbols")
                huff[(tc, th)] = _build_canonical_codes(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline frame
            if len(body) < 6:
                raise ValueError("truncated SOF")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit samples supported")
            if ncomp not in (1, 3):
                raise ValueError("only grayscale / 3-component supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        "sampling factors outside 1-2 unsupported"
                    )
                comps.append((cid, tq, hi, vi))
            if ncomp == 1 and (comps[0][2], comps[0][3]) != (1, 1):
                # a single-component scan is never interleaved: its
                # factors are irrelevant and read as 1x1 (ITU T.81
                # A.2.2); normalize so the MCU walk is one block
                comps[0] = (comps[0][0], comps[0][1], 1, 1)
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: table mapping, then entropy data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                raise ValueError("non-interleaved scans unsupported")
            mapping = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                mapping[cs] = (tables >> 4, tables & 15)
            scan = (mapping, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    mapping, data_pos = scan
    segs, _end = _split_entropy(payload, data_pos)

    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    # interleaved-MCU geometry (ITU T.81 A.2.3): an MCU covers
    # 8*hmax x 8*vmax image samples and holds hi x vi blocks of each
    # component in raster order — for 4:2:0, four Y blocks then one Cb
    # then one Cr
    mcu_w = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_h = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcu_w * mcu_h
    planes = [
        np.zeros((mcu_h * vi * 8, mcu_w * hi * 8))
        for (_cid, _tq, hi, vi) in comps
    ]
    preds = [0] * ncomp
    seg_i = 0
    reader = _BitReader(segs[0])
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1  # RST boundary: new segment, predictors reset
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_i])
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcu_w)
        for ci, (cid, tq, hi, vi) in enumerate(comps):
            if cid not in mapping:
                raise ValueError("scan component not in frame")
            dc_id, ac_id = mapping[cid]
            dc_codes = huff.get((0, dc_id))
            ac_codes = huff.get((1, ac_id))
            qt = qtables.get(tq)
            if dc_codes is None or ac_codes is None or qt is None:
                raise ValueError("scan references missing table")
            for by in range(vi):
                for bx in range(hi):
                    coeffs = np.zeros(64)
                    size = reader.read_symbol(dc_codes)
                    preds[ci] += _extend(reader.read_bits(size), size)
                    coeffs[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = reader.read_symbol(ac_codes)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        coeffs[ZIGZAG[k]] = _extend(
                            reader.read_bits(sym & 15), sym & 15
                        )
                        k += 1
                    block = _idct(coeffs.reshape(8, 8) * qt) + 128.0
                    r0 = (my * vi + by) * 8
                    c0 = (mx * hi + bx) * 8
                    planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
    # crop each plane to its component resolution, upsample to full
    # resolution by sample replication (the only upsampling the spec
    # mandates; smoother filters are an encoder-decoder pair choice),
    # then crop to the frame
    full = []
    for (plane, (_cid, _tq, hi, vi)) in zip(planes, comps):
        comp_w = (w * hi + hmax - 1) // hmax
        comp_h = (h * vi + vmax - 1) // vmax
        p = plane[:comp_h, :comp_w]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    cropped = [np.clip(np.rint(p), 0, 255).astype(np.int64) for p in full]
    n_px = w * h
    if ncomp == 1:
        y = cropped[0]
        return {
            "width": w,
            "height": h,
            "channels": 1,
            "n_pixels": n_px,
            "mean_r": int(y.sum()) // n_px,
            "mean_g": int(y.sum()) // n_px,
            "mean_b": int(y.sum()) // n_px,
            "tl": int(y[0, 0]),
        }
    yy, cb, cr = (c.astype(np.float64) for c in cropped)
    r = np.clip(np.rint(yy + 1.402 * (cr - 128)), 0, 255).astype(np.int64)
    g = np.clip(
        np.rint(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255
    ).astype(np.int64)
    b = np.clip(np.rint(yy + 1.772 * (cb - 128)), 0, 255).astype(np.int64)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "n_pixels": n_px,
        "mean_r": int(r.sum()) // n_px,
        "mean_g": int(g.sum()) // n_px,
        "mean_b": int(b.sum()) // n_px,
        "tl": int(r[0, 0]),
    }


# ---------------------------------------------------------------------------
# Encoder twin (synth side): emits genuine baseline containers with its
# own embedded canonical Huffman tables — the decoder must build codes
# from DHT, exactly as with any real file.
# ---------------------------------------------------------------------------

#: Encoder Huffman geometry: DC symbols are size categories 0-11 as
#: 4-bit codes (12 of 16 slots; the all-ones code stays unused), AC
#: symbols are EOB, ZRL and (run 0-15, size 1-8) as 8-bit codes (130 of
#: 256 slots). Any valid table is legal JPEG — the file carries it.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 9)
]


def _encoder_tables() -> tuple[list[int], bytes, list[int], bytes]:
    dc_bits = [0] * 16
    dc_bits[3] = len(_DC_SYMS)  # all length-4
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_SYMS)  # all length-8
    return dc_bits, bytes(_DC_SYMS), ac_bits, bytes(_AC_SYMS)


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nacc = 0

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)


def _csize(v: int) -> int:
    """JPEG magnitude category of a signed coefficient."""
    return abs(v).bit_length()


def _box_downsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Mean-pool ``p`` by (fy, fx), edge-replicating odd tails first —
    the standard chroma downsampler (box filter)."""
    h, w = p.shape
    ph, pw = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
    q = np.empty((ph, pw))
    q[:h, :w] = p
    q[h:, :w] = p[h - 1 : h, :]
    q[:, w:] = q[:, w - 1 : w]
    return q.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray,
    restart_interval: int = 0,
    subsampling: str = "444",
    color_space: str = "rgb",
) -> bytes:
    """Encode a grayscale (h, w) or color (h, w, 3) uint8 array as a
    genuine baseline JPEG: level shift, 8x8 forward DCT, quantization
    by ``quant`` (natural order), canonical-Huffman entropy coding with
    byte stuffing, optional DRI/RSTn restart markers. Color converts to
    ITU YCbCr (or takes the channels AS YCbCr planes when
    ``color_space="ycbcr"`` — the synth side uses this to build
    bit-exact uniform-tile containers) and encodes ``subsampling``:
    ``"444"`` (all factors 1x1), ``"420"`` (Y 2x2, chroma box-mean
    downsampled 2x2 — the dominant real-world layout) or ``"422"``
    (Y 2x1, chroma halved horizontally)."""
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        chans = img.astype(np.float64)
        if color_space == "ycbcr":
            planes = [chans[:, :, 0], chans[:, :, 1], chans[:, :, 2]]
        elif color_space == "rgb":
            r, g, b = chans[:, :, 0], chans[:, :, 1], chans[:, :, 2]
            planes = [
                0.299 * r + 0.587 * g + 0.114 * b,
                -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                0.5 * r - 0.418688 * g - 0.081312 * b + 128,
            ]
        else:
            raise ValueError("color_space must be 'rgb' or 'ycbcr'")
    else:
        raise ValueError("expected (h, w) or (h, w, 3) image array")
    h, w = planes[0].shape
    if len(planes) == 1 or subsampling == "444":
        factors = [(1, 1)] * len(planes)
    elif subsampling == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "422":
        factors = [(2, 1), (1, 1), (1, 1)]
    else:
        raise ValueError("subsampling must be '444', '420' or '422'")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_w = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_h = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hi, vi) in zip(planes, factors):
        if (hi, vi) != (hmax, vmax):
            p = _box_downsample(p, vmax // vi, hmax // hi)
        ch, cw = p.shape
        th, tw = mcu_h * vi * 8, mcu_w * hi * 8
        q = np.empty((th, tw))
        q[:ch, :cw] = p
        q[ch:, :cw] = p[ch - 1 : ch, :]  # edge-replicate padding
        q[:, cw:] = q[:, cw - 1 : cw]
        padded.append(q)

    dc_bits, dc_vals, ac_bits, ac_vals = _encoder_tables()
    dc_codes = {
        sym: (ln, code)
        for (ln, code), sym in _build_canonical_codes(dc_bits, dc_vals).items()
    }
    ac_codes = {
        sym: (ln, code)
        for (ln, code), sym in _build_canonical_codes(ac_bits, ac_vals).items()
    }

    ncomp = len(planes)
    qz = bytes(int(quant.reshape(64)[ZIGZAG[i]]) for i in range(64))
    segments: list[bytes] = []
    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcus = mcu_w * mcu_h
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            segments.append(writer.flush())
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcu_w)
        for ci in range(ncomp):
            hi, vi = factors[ci]
            for by in range(vi):
                for bx in range(hi):
                    r0 = (my * vi + by) * 8
                    c0 = (mx * hi + bx) * 8
                    block = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                    coeffs = np.rint(
                        _fdct(block - 128.0) / quant
                    ).astype(np.int64)
                    diff = int(coeffs[0, 0]) - preds[ci]
                    preds[ci] = int(coeffs[0, 0])
                    size = _csize(diff)
                    if size > 11:
                        raise ValueError(
                            "DC difference out of category range"
                        )
                    ln, code = dc_codes[size]
                    writer.write(code, ln)
                    if size:
                        writer.write(
                            diff if diff > 0 else diff + (1 << size) - 1,
                            size,
                        )
                    flat = coeffs.reshape(64)
                    zz = [int(flat[ZIGZAG[k]]) for k in range(64)]
                    run = 0
                    for k in range(1, 64):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[0xF0]
                            writer.write(code, ln)
                            run -= 16
                        size = _csize(zz[k])
                        if size > 8:
                            raise ValueError(
                                "AC coefficient out of encoder range"
                            )
                        ln, code = ac_codes[(run << 4) | size]
                        writer.write(code, ln)
                        v = zz[k]
                        writer.write(
                            v if v > 0 else v + (1 << size) - 1, size
                        )
                        run = 0
                    if run:
                        ln, code = ac_codes[0x00]  # EOB
                        writer.write(code, ln)
    segments.append(writer.flush())

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + qz)
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, ncomp)
        + b"".join(
            struct.pack(
                ">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0
            )
            for i in range(ncomp)
        ),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(
        0xDA,
        bytes([ncomp])
        + b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(ncomp))
        + b"\x00\x3f\x00",
    )
    for i, s in enumerate(segments):
        out += s
        if i < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)
