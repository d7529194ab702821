"""Ground-truth JBIG2 decode via the LIVE reference engine.

The reference vendors pdf.js v4.5.136 whose pure-JS JBIG2 decoder
(`parseJbig2Chunks`, pdf.worker.js:9216-10973) is the behavior our
`pdfkernel/jbig2.py` must match.  Like tools/differential.py, this slices
the read-only reference bundle AT RUNTIME into /tmp (reference code never
enters this repo) and runs it under node to decode arbitrary JBIG2
chunk streams, returning the packed 1-bpp page buffer.

Usage: ref_decode(data, globals=None) -> bytes (packed rows, 1 = black)
"""

from __future__ import annotations

import os
import subprocess
import tempfile

WORKER = "/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js"
# concatenated-module boundaries in the bundle: ccitt.js (MMR generic
# regions delegate to CCITTFaxDecoder), arithmetic_decoder.js, jbig2.js
SLICE_START, SLICE_END = 8038, 10973
RUNNER = "/tmp/refdump/jbig2_ref.js"

_SHIMS = """
class BaseException extends Error {
  constructor(msg, name) { super(msg); this.name = name; }
}
class FormatError extends BaseException {
  constructor(msg) { super(msg, 'FormatError'); }
}
function info() {}
function log2(x) { if (x <= 0) return 0; return Math.ceil(Math.log2(x)); }
function shadow(obj, prop, value) {
  Object.defineProperty(obj, prop, {value, enumerable: true,
                                    configurable: true, writable: false});
  return value;
}
class DecodeStream {}  // CCITTFaxStream base; unused by the jbig2 path
function readUint32(d, o) {
  return ((d[o] << 24) | (d[o+1] << 16) | (d[o+2] << 8) | d[o+3]) >>> 0;
}
function readUint16(d, o) { return (d[o] << 8) | d[o+1]; }
function readInt8(d, o) { return (d[o] << 24) >> 24; }
"""

_MAIN = """
const fs = require('fs');
const paths = process.argv.slice(2);
const out = paths.pop();
const chunks = paths.map(p => {
  const d = new Uint8Array(fs.readFileSync(p));
  return {data: d, start: 0, end: d.length};
});
try {
  const buf = parseJbig2Chunks(chunks);
  fs.writeFileSync(out, Buffer.from(buf));
} catch (e) {
  console.error('JBIG2REF_ERROR: ' + e.message);
  process.exit(3);
}
"""


def _ensure_runner() -> str:
    if not os.path.exists(RUNNER):
        os.makedirs(os.path.dirname(RUNNER), exist_ok=True)
        with open(WORKER, encoding="utf-8") as f:
            lines = f.readlines()
        slice_src = "".join(lines[SLICE_START - 1:SLICE_END])
        with open(RUNNER, "w", encoding="utf-8") as f:
            f.write(_SHIMS + slice_src + _MAIN)
    return RUNNER


def ref_decode(data: bytes, globals_: bytes | None = None) -> bytes:
    """Decode embedded-organization JBIG2 chunks with the reference
    decoder; returns the packed page buffer (rowSize=(W+7)>>3, 1=black)."""
    runner = _ensure_runner()
    paths = []
    try:
        for blob in ([globals_] if globals_ else []) + [data]:
            with tempfile.NamedTemporaryFile(suffix=".jb2", delete=False) as f:
                f.write(blob)
                paths.append(f.name)
        out_path = paths[-1] + ".bin"
        r = subprocess.run(["node", runner, *paths, out_path],
                           capture_output=True, timeout=120)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode(errors="replace").strip())
        with open(out_path, "rb") as f:
            return f.read()
    finally:
        for p in paths + [paths[-1] + ".bin" if paths else []]:
            if isinstance(p, str):
                try:
                    os.unlink(p)
                except OSError:
                    pass


if __name__ == "__main__":
    import sys

    with open(sys.argv[1], "rb") as f:
        payload = f.read()
    buf = ref_decode(payload)
    sys.stdout.write(f"{len(buf)} bytes\n")
