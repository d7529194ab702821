"""Ground-truth JPEG2000 decode via the reference's vendored openjpeg.

pdf.js v4 decodes JPX through an emscripten openjpeg module whose wasm
binary is embedded base64 in the bundle
(/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js:12314-12864,
external/openjpeg/openjpeg.js).  Like tools/differential.py and
tools/jbig2_ref.py, this slices the read-only bundle AT RUNTIME into
/tmp and runs it under node — reference code never enters this repo.

ref_decode(codestream, num_components) returns the raw component
samples (interleaved uint8) exactly as the reference image pipeline
receives them (numComponents=0 → _copy_pixels_N raw copy path).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

WORKER = "/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js"
SLICE_START, SLICE_END = 12314, 12864
RUNNER = "/tmp/refdump/jpx_ref.js"

_MAIN = """
const fs = require('fs');
(async () => {
  const data = new Uint8Array(fs.readFileSync(process.argv[2]));
  const mod = await OpenJPEG({warn: m => console.error('warn: ' + m)});
  const img = mod.decode(data, {numComponents: 0});
  if (typeof img === 'string') {
    console.error('JPXREF_ERROR: ' + img);
    process.exit(3);
  }
  fs.writeFileSync(process.argv[3], Buffer.from(img.buffer ?? img));
  console.log(JSON.stringify({length: img.length}));
})().catch(e => { console.error('JPXREF_ERROR: ' + e.message); process.exit(3); });
"""


def _ensure_runner() -> str:
    if not os.path.exists(RUNNER):
        os.makedirs(os.path.dirname(RUNNER), exist_ok=True)
        with open(WORKER, encoding="utf-8") as f:
            lines = f.readlines()
        slice_src = "".join(lines[SLICE_START - 1:SLICE_END])
        with open(RUNNER, "w", encoding="utf-8") as f:
            f.write(slice_src + _MAIN)
    return RUNNER


def ref_decode(data: bytes) -> bytes:
    """Decode a JPX codestream / JP2 file with the reference's openjpeg
    wasm; returns raw interleaved component samples (uint8)."""
    runner = _ensure_runner()
    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
        f.write(data)
        in_path = f.name
    out_path = in_path + ".bin"
    try:
        r = subprocess.run(["node", runner, in_path, out_path],
                           capture_output=True, timeout=120)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode(errors="replace").strip())
        with open(out_path, "rb") as f:
            return f.read()
    finally:
        for p in (in_path, out_path):
            try:
                os.unlink(p)
            except OSError:
                pass


if __name__ == "__main__":
    import sys

    with open(sys.argv[1], "rb") as f:
        payload = f.read()
    out = ref_decode(payload)
    json.dump({"bytes": len(out)}, sys.stdout)
