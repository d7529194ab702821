"""Mixed-modality media table: deterministic JPEG (baseline +
progressive), PNG, GIF, WAV, PDF and corrupt blobs, for exercising the
multimodal feature stage's REAL decoders end-to-end in a distributed
query (m_media_features_mixed).  Cached under /tmp, keyed by its own
version (independent of the interleaved corpus cache).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIXED_VERSION = "v8"  # v6: +image PDFs; v7: +AVI; v8: +raw/MJPG video AVIs


def _make_wav(seconds: float, rate: int = 1000) -> bytes:
    n = int(seconds * rate)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", n) + b"\x80" * n)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _make_gif(idx: np.ndarray, pal: np.ndarray) -> bytes:
    h, w = idx.shape
    full = np.zeros((256, 3), np.uint8)
    full[: len(pal)] = pal
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out += bytes([0x87, 0, 0]) + full.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes([8])
    bits = bytearray()
    acc = nb = 0

    def emit(code):
        nonlocal acc, nb
        acc |= code << nb
        nb += 9
        while nb >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    emit(256)
    for i, px in enumerate(idx.reshape(-1)):
        if i and i % 100 == 0:
            emit(256)
        emit(int(px))
    emit(257)
    if nb:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        c = bits[i:i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3b"
    return bytes(out)


def _make_png(img: np.ndarray) -> bytes:
    import zlib

    h, w = img.shape[:2]
    nch = 1 if img.ndim == 2 else img.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[nch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += img[y].tobytes()

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _make_tiff_g4(img: np.ndarray) -> bytes:
    """Single-strip little-endian CCITT-G4 TIFF."""
    from .ccittgen import encode_g4

    h, w = img.shape
    strip = encode_g4(img)
    entries = []
    base = 8 + 2 + 12 * 8 + 4

    def entry(tag, typ, vals, off):
        size = {3: 2, 4: 4}[typ]
        if size * len(vals) <= 4:
            payload = b"".join(struct.pack("<" + ("H" if typ == 3 else "I"), v)
                               for v in vals).ljust(4, b"\x00")
            return struct.pack("<HHI", tag, typ, len(vals)) + payload
        raise ValueError("inline only")

    for tag, typ, vals in ((256, 4, [w]), (257, 4, [h]), (258, 3, [1]),
                           (259, 3, [4]), (262, 3, [0]), (273, 4, [base]),
                           (278, 4, [h]), (279, 4, [len(strip)])):
        entries.append(entry(tag, typ, vals, base))
    return (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 8)
            + b"".join(entries) + b"\x00\x00\x00\x00" + strip)


def _make_mp3(n_frames: int = 20) -> bytes:
    """MPEG1 Layer-III mono 128 kbps VBR stream with a Xing frame count."""
    flen = 144 * 128000 // 44100
    frame = bytearray([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * (flen - 4)
    off = 4 + 17  # mono MPEG1 side-info
    frame[off:off + 4] = b"Xing"
    frame[off + 4:off + 8] = struct.pack(">I", 1)
    frame[off + 8:off + 12] = struct.pack(">I", n_frames)
    return bytes(frame) * n_frames


def _make_avi(duration_s: float, fps: int = 25) -> bytes:
    total = int(round(duration_s * fps))
    usec = int(1e6 / fps)
    avih = struct.pack("<14I", usec, 0, 0, 0, total, 0, 1, 0,
                       320, 240, 0, 0, 0, 0)
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    body = b"AVI " + lst
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _make_avi_rgb(frames: "np.ndarray", fps: int = 25,
                  compressed: bool = False) -> bytes:
    """AVI with a REAL uncompressed 24-bit DIB video stream: (N, h, w, 3)
    RGB frames become bottom-up padded BGR '00db' movi chunks (the layout
    decode_avi_frames samples).  ``compressed=True`` instead emits '00dc'
    chunks + a nonzero biCompression — the honest-stub path."""
    n, h, w, _ = frames.shape
    usec = int(1e6 / fps)
    avih = struct.pack("<14I", usec, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + (b"MJPG" if compressed else b"DIB ")
            + struct.pack("<IHHIIIIIIIi4h", 0, 0, 0, 0, 1, fps, 0, n,
                          0, 10000, -1, 0, 0, w, h))
    comp = 0x47504A4D if compressed else 0  # 'MJPG'
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp,
                       ((w * 3 + 3) & ~3) * h, 0, 0, 0, 0)
    strl = (b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    strl_list = b"LIST" + struct.pack("<I", 4 + len(strl)) + b"strl" + strl
    hdrl = (b"avih" + struct.pack("<I", len(avih)) + avih + strl_list)
    hdrl_list = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    row_bytes = (w * 3 + 3) & ~3
    movi = b"movi"
    cc = b"00dc" if compressed else b"00db"
    for f in frames:
        bgr = f[:, :, ::-1]          # RGB → BGR
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, :w * 3] = bgr.reshape(h, w * 3)
        payload = rows[::-1].tobytes()  # bottom-up
        movi += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            movi += b"\x00"
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + movi
    body = b"AVI " + hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _make_mp4(duration_s: float, timescale: int = 1000) -> bytes:
    mvhd = bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0) \
        + struct.pack(">II", timescale, int(duration_s * timescale)) + b"\x00" * 80
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    return struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00" + moov


def generate_mixed_media(out_dir: str, n_rows: int, seed: int = 42) -> None:
    from .jpeggen import encode_baseline_jpeg, encode_progressive_jpeg
    from .pdfgen import make_seeded_pdf

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    refs, blobs, kinds = [], [], []
    for i in range(n_rows):
        kind = ("jpeg", "jpeg_progressive", "png", "gif", "wav", "pdf",
                "tiff_g4", "mp3", "mp4", "jbig2", "jp2", "pdf_images",
                "avi", "junk", "avi_rgb", "avi_mjpg")[i % 16]
        h = int(rng.randint(8, 40))
        w = int(rng.randint(8, 40))
        if kind == "jpeg":
            blob = encode_baseline_jpeg(rng.randint(0, 256, (h, w)).astype(np.uint8))
        elif kind == "jpeg_progressive":
            blob = encode_progressive_jpeg(
                rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
        elif kind == "png":
            blob = _make_png(rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
        elif kind == "gif":
            pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
            blob = _make_gif(rng.randint(0, 256, (h, w)).astype(np.uint8), pal)
        elif kind == "wav":
            blob = _make_wav(float(rng.randint(1, 30)) / 10.0)
        elif kind == "pdf":
            blob = make_seeded_pdf(9_000_000 + i)[0]
        elif kind == "tiff_g4":
            blob = _make_tiff_g4((rng.rand(h, w) > 0.7).astype(np.uint8))
        elif kind == "mp3":
            blob = _make_mp3(n_frames=int(rng.randint(5, 40)))
        elif kind == "mp4":
            blob = _make_mp4(float(rng.randint(1, 600)) / 10.0)
        elif kind == "jbig2":
            from .jbig2gen import build_generic_stream

            img = (rng.rand(h, w) > 0.75).astype(np.uint8)
            stream = build_generic_stream(img.tolist(), template=0,
                                          tpgdon=bool(i % 2))
            # standalone file header: magic, sequential org + known pages
            blob = (b"\x97JB2\r\n\x1a\x0a" + bytes([1])
                    + struct.pack(">I", 1) + stream)
        elif kind == "jp2":
            from .jpxgen import encode_jpx, wrap_jp2

            if i % 2:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                blob = wrap_jp2(encode_jpx(img, levels=1), w, h, 3)
            else:
                img = rng.randint(0, 256, (h, w)).astype(np.uint8)
                blob = encode_jpx(img, levels=2)  # raw codestream flavor
        elif kind == "pdf_images":
            from .imagepdf import make_images_pdf

            blob = make_images_pdf(seed=i)[0]
        elif kind == "avi":
            blob = _make_avi(float(rng.randint(1, 300)) / 10.0)
        elif kind in ("avi_rgb", "avi_mjpg"):
            frames = rng.randint(0, 256, (int(rng.randint(4, 12)), h, w, 3)) \
                .astype(np.uint8)
            blob = _make_avi_rgb(frames, fps=int(rng.randint(5, 30)),
                                 compressed=(kind == "avi_mjpg"))
        else:
            blob = bytes(rng.randint(0, 256, 64).astype(np.uint8))
        refs.append(f"mixed-{i:06d}")
        blobs.append(blob)
        kinds.append(kind)
    t = pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "kind": pa.array(kinds, pa.string()),
    })
    pq.write_table(t, os.path.join(out_dir, "part-00000.parquet"))


def mixed_media_dir_for(sf: float, base: str = "/tmp/graft_media_mixed") -> str:
    n_rows = max(35, int(7_000 * sf))
    out = os.path.join(base, f"sf{sf:g}")
    marker = os.path.join(out, "_SUCCESS")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read().strip()
    if current != MIXED_VERSION:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        generate_mixed_media(out, n_rows=n_rows)
        with open(marker, "w") as f:
            f.write(MIXED_VERSION)
    return out
