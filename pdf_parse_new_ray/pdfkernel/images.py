"""Embedded-image inventory + decode for PDF documents.

Walks each page's /Resources /XObject for /Subtype /Image entries and
decodes the sample data through the kernel's codec set — the same
filters pdf.js's image pipeline dispatches on
(/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js: jpg.js
DCTDecode, jbig2.js JBIG2Decode, openjpeg JPXDecode, ccitt.js
CCITTFaxDecode).  The reference's text extractor never decodes images
(pdf-parse is text-only); this surface is the additive
training-data-pipeline view over the same kernel: at 100 TB the stage
runs as an actor-pool `map_batches` over media blobs
(stages/multimodal.PdfImageExtractor).
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional

import numpy as np

from .cos import Name, PDFError, StreamObj
from .document import PDFDocument

_IMG_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF",
                "JBIG2Decode"}


def _image_filter(doc: PDFDocument, sdict: dict) -> Optional[str]:
    filters = doc.resolve(sdict.get("Filter"))
    if filters is None:
        return None
    if isinstance(filters, (Name, str)):
        filters = [filters]
    for f in filters:
        name = str(doc.resolve(f))
        if name in _IMG_FILTERS:
            return {"DCT": "DCTDecode", "CCF": "CCITTFaxDecode"}.get(name,
                                                                     name)
    return None


def _image_parms(doc: PDFDocument, sdict: dict) -> dict:
    parms = doc.resolve(sdict.get("DecodeParms", sdict.get("DP")))
    if isinstance(parms, list):
        for p in parms:
            p = doc.resolve(p)
            if isinstance(p, dict) and (
                    "JBIG2Globals" in p or "K" in p or "Columns" in p):
                return p
        return {}
    return parms if isinstance(parms, dict) else {}


def _colorspace_name(doc: PDFDocument, cs: Any) -> str:
    cs = doc.resolve(cs)
    if isinstance(cs, (Name, str)):
        return str(cs)
    if isinstance(cs, list) and cs:
        head = str(doc.resolve(cs[0]))
        if head == "ICCBased":
            n = doc.resolve(cs[1])
            ncomp = doc.resolve(n.dict.get("N")) if isinstance(
                n, StreamObj) else "?"
            return f"ICCBased:{ncomp}"
        if head == "Indexed":
            return f"Indexed[{_colorspace_name(doc, cs[1])}]"
        return head
    return "?"


def decode_image_xobject(doc: PDFDocument, xobj: StreamObj,
                         max_pixels: int = 1 << 22) -> dict:
    """Decode one image XObject → metadata + decoded sample digest.

    Returns dict with width/height/bpc/colorspace/filter/decoded and
    either pixel_sha256 (hex of the decoded sample array bytes) or
    error.  Decode failures are absorbed, never raised."""
    d = xobj.dict
    width = int(doc.resolve(d.get("Width", 0)) or 0)
    height = int(doc.resolve(d.get("Height", 0)) or 0)
    bpc = int(doc.resolve(d.get("BitsPerComponent", 8)) or 8)
    mask = bool(doc.resolve(d.get("ImageMask", False)))
    info = {
        "width": width,
        "height": height,
        "bpc": 1 if mask else bpc,
        "colorspace": "ImageMask" if mask
        else _colorspace_name(doc, d.get("ColorSpace")),
        "filter": _image_filter(doc, d) or "raw",
        "decoded": False,
        "pixel_sha256": None,
        "error": None,
    }
    try:
        if width <= 0 or height <= 0:
            raise PDFError("missing image dimensions")
        if width * height > max_pixels:
            raise PDFError(f"image {width}x{height} exceeds decode cap")
        payload = xobj.get_data(doc.resolve)  # pre-filters applied;
        # image codec payload left intact by filters.decode_stream
        filt = info["filter"]
        parms = _image_parms(doc, d)
        if filt == "DCTDecode":
            from .jpeg import decode_jpeg

            h, w, _nc, px = decode_jpeg(payload)
            arr = np.asarray(px)
        elif filt == "JPXDecode":
            from .jpx import decode_jpx

            arr = decode_jpx(payload, max_pixels=max_pixels)
        elif filt == "JBIG2Decode":
            from .jbig2 import decode_jbig2

            glob = doc.resolve(parms.get("JBIG2Globals"))
            gbytes = glob.get_data(doc.resolve) if isinstance(
                glob, StreamObj) else None
            arr = decode_jbig2(payload, gbytes, max_pixels=max_pixels)
        elif filt == "CCITTFaxDecode":
            from .ccitt import decode_ccitt

            k = int(doc.resolve(parms.get("K", 0)) or 0)
            cols = int(doc.resolve(parms.get("Columns", 1728)) or 1728)
            rows = int(doc.resolve(parms.get("Rows", height)) or height)
            arr = decode_ccitt(payload, columns=cols, rows=rows, k=k,
                               byte_align=bool(doc.resolve(
                                   parms.get("EncodedByteAlign", False))))
        else:  # raw samples through standard filters
            ncomp = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4,
                     "ImageMask": 1}.get(info["colorspace"].split("[")[0], 1)
            if info["colorspace"].startswith("Indexed"):
                ncomp = 1
            need = (width * ncomp * info["bpc"] + 7) // 8 * height
            if len(payload) < need:
                raise PDFError(f"raw image data short: {len(payload)} "
                               f"< {need}")
            arr = np.frombuffer(payload[:need], dtype=np.uint8)
        info["decoded"] = True
        info["pixel_sha256"] = hashlib.sha256(
            np.ascontiguousarray(arr).tobytes()).hexdigest()
    except Exception as e:  # noqa: BLE001 — absorb-to-error contract
        info["error"] = f"{type(e).__name__}: {e}"
    return info


def list_images(data: bytes, max_pixels: int = 1 << 22) -> list[dict]:
    """All image XObjects of a PDF, decoded where the codec allows.
    One dict per image with page index and resource name attached."""
    doc = PDFDocument(data)
    out: list[dict] = []
    seen: set[int] = set()
    for pageno, page in enumerate(doc.pages(), 1):
        res = doc.resolve(page.get("Resources")) or {}
        xobjects = doc.resolve(res.get("XObject")) or {}
        if not isinstance(xobjects, dict):
            continue
        for name, ref in xobjects.items():
            xo = doc.resolve(ref)
            if not isinstance(xo, StreamObj):
                continue
            subtype = str(doc.resolve(xo.dict.get("Subtype", "")))
            if subtype != "Image":
                continue
            key = id(xo)
            if key in seen:
                continue
            seen.add(key)
            rec = decode_image_xobject(doc, xo, max_pixels=max_pixels)
            rec["page"] = pageno
            rec["name"] = str(name)
            out.append(rec)
    return out
