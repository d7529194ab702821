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

MIXED_VERSION = "v9"  # v8: +raw/MJPG video AVIs; v9: +planted-truth sidecar


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
    """Write the mixed table AND its planted-truth sidecar (``{out_dir}_truth``
    — a SIBLING dir so ``read_parquet(out_dir)`` never sees it): per-ref
    expected feature values, per-sampled-frame video truth and per-image
    PDF-inventory truth, all computed from the source arrays / container
    parameters in hand at generation time, never from the engine decoders
    (pixel truths via fixtures.planted's independent scalar math)."""
    from .jpeggen import encode_baseline_jpeg, encode_progressive_jpeg
    from .pdfgen import make_seeded_pdf
    from .planted import KIND_SNIFF, planted_ahash64, planted_resize_digest

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    refs, blobs, kinds = [], [], []
    feat_rows, frame_rows, pdfimg_rows = [], [], []
    for i in range(n_rows):
        kind = ("jpeg", "jpeg_progressive", "png", "gif", "wav", "pdf",
                "tiff_g4", "mp3", "mp4", "jbig2", "jp2", "pdf_images",
                "avi", "junk", "avi_rgb", "avi_mjpg")[i % 16]
        h = int(rng.randint(8, 40))
        w = int(rng.randint(8, 40))
        ref = f"mixed-{i:06d}"
        # expected-value row defaults = the stages' absorb contracts
        tr = {
            "media_ref": ref, "kind": kind, "media_type": KIND_SNIFF[kind],
            "width": -1, "height": -1, "numpages": 0, "duration_s": -1.0,
            "decoded": False,
            # AudioFeatureExtractor absorb defaults (non-WAV rows)
            "sample_rate": -1, "channels": -1, "bits": -1, "n_frames": -1,
            "audio_duration_s": -1.0, "rms": -1.0, "peak": -1.0,
            "zero_cross_rate": -1.0, "clipped_frac": -1.0,
            "audio_decoded": False,
            # phash / resize truths: ph_check=False → row excluded from the
            # planted comparison (lossy decode, hash not generator-known)
            "ph_check": True, "ph_decoded": False, "phash": None,
            "rz_w_in": 0, "rz_h_in": 0, "rz_digest": None,
        }

        def plant_pixels(px):
            tr["ph_decoded"] = True
            tr["phash"] = planted_ahash64(px)
            tr["rz_h_in"], tr["rz_w_in"] = px.shape[0], px.shape[1]
            tr["rz_digest"] = planted_resize_digest(px, 16, 16)

        if kind == "jpeg":
            blob = encode_baseline_jpeg(rng.randint(0, 256, (h, w)).astype(np.uint8))
            tr.update(width=w, height=h, decoded=True, ph_check=False)
        elif kind == "jpeg_progressive":
            blob = encode_progressive_jpeg(
                rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
            tr.update(width=w, height=h, decoded=True, ph_check=False)
        elif kind == "png":
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            blob = _make_png(img)
            tr.update(width=w, height=h, decoded=True)
            plant_pixels(img)
        elif kind == "gif":
            pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
            idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
            blob = _make_gif(idx, pal)
            tr.update(width=w, height=h, decoded=True)
            plant_pixels(pal[idx])
        elif kind == "wav":
            seconds = float(rng.randint(1, 30)) / 10.0
            blob = _make_wav(seconds)
            n = int(seconds * 1000)
            # 8-bit offset-binary PCM, all 0x80 → every sample is exactly 0
            tr.update(duration_s=round(n / 1000, 6), decoded=True,
                      sample_rate=1000, channels=1, bits=8, n_frames=n,
                      audio_duration_s=round(n / 1000, 6), rms=0.0, peak=0.0,
                      zero_cross_rate=0.0, clipped_frac=0.0,
                      audio_decoded=True)
        elif kind == "pdf":
            blob, _txt, npages = make_seeded_pdf(9_000_000 + i)
            tr.update(numpages=npages, decoded=True)
        elif kind == "tiff_g4":
            img = (rng.rand(h, w) > 0.7).astype(np.uint8)
            blob = _make_tiff_g4(img)
            tr.update(width=w, height=h, decoded=True)
            # photometric 0 (WhiteIsZero): sample 1 = black → luma 0
            plant_pixels(((1 - img) * 255).astype(np.uint8))
        elif kind == "mp3":
            nf = int(rng.randint(5, 40))
            blob = _make_mp3(n_frames=nf)
            # MPEG1 Layer III: 1152 samples/frame at the 44.1 kHz header rate
            tr.update(duration_s=round(nf * 1152 / 44100, 6), decoded=True)
        elif kind == "mp4":
            d = float(rng.randint(1, 600)) / 10.0
            blob = _make_mp4(d)
            # mvhd stores duration*timescale truncated; timescale=1000
            tr.update(duration_s=round(int(d * 1000) / 1000, 6), decoded=True)
        elif kind == "jbig2":
            from .jbig2gen import build_generic_stream

            img = (rng.rand(h, w) > 0.75).astype(np.uint8)
            stream = build_generic_stream(img.tolist(), template=0,
                                          tpgdon=bool(i % 2))
            # standalone file header: magic, sequential org + known pages
            blob = (b"\x97JB2\r\n\x1a\x0a" + bytes([1])
                    + struct.pack(">I", 1) + stream)
            tr.update(width=w, height=h, decoded=True)
            # T.88 pixel 1 = black → luma 0
            plant_pixels(((1 - img) * 255).astype(np.uint8))
        elif kind == "jp2":
            from .jpxgen import encode_jpx, wrap_jp2

            if i % 2:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                blob = wrap_jp2(encode_jpx(img, levels=1), w, h, 3)
            else:
                img = rng.randint(0, 256, (h, w)).astype(np.uint8)
                blob = encode_jpx(img, levels=2)  # raw codestream flavor
            tr.update(width=w, height=h, decoded=True)
            plant_pixels(img)  # reversible 5/3 + RCT: decode is lossless
        elif kind == "pdf_images":
            from .imagepdf import make_images_pdf

            blob, expected = make_images_pdf(seed=i)
            tr.update(numpages=1, decoded=True)
            bpc = {"JBIG2Decode": 1, "CCITTFaxDecode": 1}
            for name in sorted(expected):
                filt, iw, ih = expected[name]
                pdfimg_rows.append({
                    "media_ref": ref, "page": 1, "name": name,
                    "filter": filt, "width": iw, "height": ih,
                    "bpc": bpc.get(filt, 8), "colorspace": "DeviceGray",
                    "decoded": True,
                })
        elif kind == "avi":
            d = float(rng.randint(1, 300)) / 10.0
            blob = _make_avi(d)
            total, usec = int(round(d * 25)), int(1e6 / 25)
            tr.update(duration_s=round(total * usec / 1e6, 6), decoded=True)
            frame_rows.append({
                "media_ref": ref, "media_type": "avi", "frame_index": -1,
                "ts_s": None, "w": 0, "h": 0, "phash": None,
                "decoded": False,  # metadata-only AVI: no movi list
            })
        elif kind in ("avi_rgb", "avi_mjpg"):
            nfr = int(rng.randint(4, 12))
            frames = rng.randint(0, 256, (nfr, h, w, 3)).astype(np.uint8)
            fps = int(rng.randint(5, 30))
            blob = _make_avi_rgb(frames, fps=fps,
                                 compressed=(kind == "avi_mjpg"))
            usec = int(1e6 / fps)
            tr.update(duration_s=round(nfr * usec / 1e6, 6), decoded=True)
            if kind == "avi_rgb":
                eff_fps = 1e6 / usec  # header-derived rate, not the input fps
                for fi in range(0, nfr, 3)[:8]:
                    frame_rows.append({
                        "media_ref": ref, "media_type": "avi",
                        "frame_index": fi, "ts_s": fi / eff_fps,
                        "w": w, "h": h, "phash": planted_ahash64(frames[fi]),
                        "decoded": True,
                    })
            else:  # compressed stream: honest decoded=False absorb row
                frame_rows.append({
                    "media_ref": ref, "media_type": "avi", "frame_index": -1,
                    "ts_s": None, "w": 0, "h": 0, "phash": None,
                    "decoded": False,
                })
        else:
            blob = bytes(rng.randint(0, 256, 64).astype(np.uint8))
            frame_rows.append({
                "media_ref": ref, "media_type": "unknown", "frame_index": -1,
                "ts_s": None, "w": 0, "h": 0, "phash": None,
                "decoded": False,
            })
        if kind in ("wav", "pdf", "mp3", "mp4", "pdf_images"):
            # every non-video ref still yields ONE absorb row from the
            # frame sampler (stage contract: never drop an input)
            frame_rows.append({
                "media_ref": ref, "media_type": KIND_SNIFF[kind],
                "frame_index": -1, "ts_s": None, "w": 0, "h": 0,
                "phash": None, "decoded": False,
            })
        elif kind in ("jpeg", "jpeg_progressive", "png", "gif", "tiff_g4",
                      "jbig2", "jp2"):
            frame_rows.append({
                "media_ref": ref, "media_type": KIND_SNIFF[kind],
                "frame_index": -1, "ts_s": None, "w": 0, "h": 0,
                "phash": None, "decoded": False,
            })
        refs.append(ref)
        blobs.append(blob)
        kinds.append(kind)
        feat_rows.append(tr)
    t = pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "kind": pa.array(kinds, pa.string()),
    })
    pq.write_table(t, os.path.join(out_dir, "part-00000.parquet"))

    truth_dir = out_dir.rstrip("/") + "_truth"
    os.makedirs(truth_dir, exist_ok=True)
    feat_schema = pa.schema([
        ("media_ref", pa.string()), ("kind", pa.string()),
        ("media_type", pa.string()), ("width", pa.int32()),
        ("height", pa.int32()), ("numpages", pa.int32()),
        ("duration_s", pa.float64()), ("decoded", pa.bool_()),
        ("sample_rate", pa.int32()), ("channels", pa.int32()),
        ("bits", pa.int32()), ("n_frames", pa.int64()),
        ("audio_duration_s", pa.float64()), ("rms", pa.float64()),
        ("peak", pa.float64()), ("zero_cross_rate", pa.float64()),
        ("clipped_frac", pa.float64()), ("audio_decoded", pa.bool_()),
        ("ph_check", pa.bool_()), ("ph_decoded", pa.bool_()),
        ("phash", pa.string()), ("rz_w_in", pa.int32()),
        ("rz_h_in", pa.int32()), ("rz_digest", pa.string()),
    ])
    pq.write_table(pa.Table.from_pylist(feat_rows, schema=feat_schema),
                   os.path.join(truth_dir, "features.parquet"))
    frame_schema = pa.schema([
        ("media_ref", pa.string()), ("media_type", pa.string()),
        ("frame_index", pa.int32()), ("ts_s", pa.float64()),
        ("w", pa.int32()), ("h", pa.int32()), ("phash", pa.string()),
        ("decoded", pa.bool_()),
    ])
    pq.write_table(pa.Table.from_pylist(frame_rows, schema=frame_schema),
                   os.path.join(truth_dir, "frames.parquet"))
    pdfimg_schema = pa.schema([
        ("media_ref", pa.string()), ("page", pa.int32()),
        ("name", pa.string()), ("filter", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("bpc", pa.int32()), ("colorspace", pa.string()),
        ("decoded", pa.bool_()),
    ])
    pq.write_table(pa.Table.from_pylist(pdfimg_rows, schema=pdfimg_schema),
                   os.path.join(truth_dir, "pdf_images.parquet"))


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
