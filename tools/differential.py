"""Differential conformance sweep: our kernel vs the LIVE reference engine.

Runs N seeded PDFs (the corpus generator's distribution, including the
~8% encrypted slice) plus every deterministic special fixture through both
engines and asserts byte-exact text equality.  The committed goldens in
the reference checkout are stale — this always runs node on the fly.

Usage: python tools/differential.py [n_seeds]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = "/tmp/refdump/diff_run_ref_full.js"
# full-surface dump: text PLUS numpages/numrender/info/metadata —
# the complete pdf-parse return value is the oracle, not just text
RUNNER_SRC = (
    "const fs=require('fs');"
    "const PDF=require('/root/reference/lib/pdf-parse.js');"
    "(async()=>{const d=fs.readFileSync(process.argv[2]);"
    "const r=await PDF(d,{});"
    "fs.writeFileSync(process.argv[3],JSON.stringify({text:r.text,"
    "numpages:r.numpages,numrender:r.numrender,"
    "info:r.info===undefined?null:r.info,"
    "metadata:r.metadata?r.metadata.getAll():null,"
    "metadata_raw:r.metadata?r.metadata.getRaw():null}));})()"
    ".catch(e=>{console.error(e);process.exit(1);});"
)


def ref_full(pdf: bytes) -> dict:
    import json

    os.makedirs(os.path.dirname(RUNNER), exist_ok=True)
    if not os.path.exists(RUNNER):
        with open(RUNNER, "w") as f:
            f.write(RUNNER_SRC)
    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(pdf)
        pdf_path = f.name
    out_path = pdf_path + ".json"
    try:
        subprocess.run(["node", RUNNER, pdf_path, out_path],
                       check=True, capture_output=True, timeout=300)
        with open(out_path, encoding="utf-8") as f:
            return json.load(f)
    finally:
        for p in (pdf_path, out_path):
            try:
                os.unlink(p)
            except OSError:
                pass


def ours_full(parse_pdf, pdf: bytes) -> dict:
    r = parse_pdf(pdf)
    m = r["metadata"]
    return {
        "text": r["text"],
        "numpages": r["numpages"],
        "numrender": r["numrender"],
        "info": r["info"],
        "metadata": m.get_all() if m is not None else None,
        "metadata_raw": m.get_raw() if m is not None else None,
    }


def full_mismatch(ours: dict, ref: dict) -> str:
    """'' when equal; else the first differing field."""
    for k in ("text", "numpages", "numrender", "info",
              "metadata", "metadata_raw"):
        if ours[k] != ref[k]:
            return k
    return ""


def build_cases(n_seeds: int) -> list[tuple[str, bytes]]:
    """n seeded corpus-distribution PDFs + every deterministic special
    fixture (also used by tests/test_kernel.py's `slow` sweep)."""
    from pdf_parse_new_ray.fixtures import pdfgen

    cases: list[tuple[str, bytes]] = []
    for seed in range(n_seeds):
        pdf, _, _ = pdfgen.make_seeded_pdf(7_777_777 + seed)
        cases.append((f"seed-{seed}" + ("-enc" if b"/Encrypt" in pdf else ""), pdf))
    specials = [
        ("tj-kerning", pdfgen.make_tj_kerning_pdf()[0]),
        ("ytol", pdfgen.make_ytol_pdf()[0]),
        ("ligature", pdfgen.make_ligature_pdf()[0]),
        ("identity-h", pdfgen.make_identity_h_pdf()[0]),
        ("empty-page", pdfgen.make_empty_page_pdf()[0]),
        ("inline-image", pdfgen.make_inline_image_pdf()[0]),
        ("rotated", pdfgen.make_rotated_text_pdf()[0]),
        ("hscale-rise", pdfgen.make_hscale_rise_pdf()[0]),
        ("qq-cm", pdfgen.make_qq_cm_pdf()[0]),
        ("form-xobject", pdfgen.make_form_xobject_pdf()[0]),
        ("type3", pdfgen.make_type3_pdf()[0]),
        ("rtl-mixed", pdfgen.make_rtl_pdf()),
        ("identity-v-vertical", pdfgen.make_identity_v_pdf()),
        ("ttf-win-names", pdfgen.make_symbolic_truetype_pdf(True)[0]),
        ("ttf-mac-name", pdfgen.make_symbolic_truetype_pdf(False)[0]),
        ("cff-builtin-encoding", pdfgen.make_cff_builtin_encoding_pdf()[0]),
        ("tounicode-surrogate-pairs", pdfgen.make_surrogate_pair_pdf()),
        ("number-syntax", pdfgen.make_number_syntax_pdf()),
        ("objstm-type2-xref", pdfgen.make_objstm_pdf()[0]),
        ("incremental-update", pdfgen.make_incremental_update_pdf()[0]),
        ("bad-startxref-recovery", pdfgen.make_bad_startxref_pdf()[0]),
        ("shifted-header", pdfgen.make_shifted_header_pdf()[0]),
        ("inherited-tree", pdfgen.make_inherited_tree_pdf()[0]),
        ("inherited-tree-rot90", pdfgen.make_inherited_tree_pdf(90)[0]),
        ("encrypted-objstm-aesv2", pdfgen.make_encrypted_objstm_pdf("aesv2")[0]),
        ("malformed-ops", pdfgen.make_malformed_ops_pdf()),
        ("embedded-cmap", pdfgen.make_embedded_cmap_pdf()),
        ("embedded-cmap-widths", pdfgen.make_embedded_cmap_pdf(with_widths=True)),
        ("embedded-cmap-wmode1", pdfgen.make_embedded_cmap_pdf(wmode=1)),
    ]
    # full 0x20-0xFF table sweeps: every Annex D base-encoding slot, the
    # Symbol/ZapfDingbats set-encoding defaults, the std-font alias map and
    # the name-keyed AFM width path (glyphs outside the AFM get width 0)
    for enc, bf in (("StandardEncoding", "Helvetica"),
                    ("WinAnsiEncoding", "Helvetica"),
                    ("MacRomanEncoding", "Helvetica"),
                    ("MacExpertEncoding", "Helvetica"),
                    (None, "Symbol"), (None, "ZapfDingbats"),
                    (None, "Courier"), (None, "Times-Roman"),
                    (None, "Arial"), (None, "Bookman-Demi")):
        tag = (enc or "default").replace("Encoding", "").lower()
        specials.append((f"encsweep-{tag}-{bf.lower()}",
                         pdfgen.make_base_encoding_sweep_pdf(enc, bf)))
    # randomized operator/state torture (validated at 120 seeds each when
    # introduced; a rotating window keeps the sweep fast but fresh)
    for k in range(6):
        fz = n_seeds * 31 + k
        specials.append((f"opfuzz-{fz}", pdfgen.make_operator_fuzz_pdf(fz)))
        specials.append((f"statefuzz-{fz}", pdfgen.make_state_fuzz_pdf(fz)))
        if k < 3:
            specials.append((f"toufuzz-{fz}",
                             pdfgen.make_tounicode_fuzz_pdf(fz)))
            specials.append((f"cidtoufuzz-{fz}",
                             pdfgen.make_cid_tounicode_fuzz_pdf(fz)))
    for mode in ("rc4-40", "rc4-128", "aesv2", "aesv3"):
        specials.append((f"encrypted-{mode}", pdfgen.make_encrypted_pdf(mode)[0]))
    specials.append(("encrypted-aesv3-xstream",
                     pdfgen.make_encrypted_pdf("aesv3", use_xref_stream=True)[0]))
    for variant in ("rich", "utf16repair", "utf16repair-clean",
                    "malformed", "invalid-utf8",
                    "direct-dict", "wrong-type"):
        specials.append((f"xmp-{variant}",
                         pdfgen.make_xmp_metadata_pdf(variant)))
    for variant in ("midtoken", "nows", "broken"):
        specials.append((f"split-contents-{variant}",
                         pdfgen.make_split_contents_pdf(variant)))
    specials.append(("string-syntax", pdfgen.make_string_syntax_pdf()))
    specials.append(("filter-cascade", pdfgen.make_filter_cascade_pdf()))
    for variant in ("omitted", "free-markers"):
        specials.append((f"hybrid-xref-{variant}",
                         pdfgen.make_hybrid_xref_pdf(variant)))
    specials.append(("knowncmd-split", pdfgen.make_knowncmd_pdf()))
    specials.append(("longcmd-abort", pdfgen.make_longcmd_pdf()))
    for variant in ("valid", "n-overcount", "l-mismatch", "bad-hints",
                    "zero"):
        specials.append((f"linearized-{variant}",
                         pdfgen.make_linearized_pdf(variant)))
    for count in (3, 0):
        specials.append((f"count-lie-{count}",
                         pdfgen.make_count_lie_pdf(count)))
    for cv in ("1.7", "1.10"):
        specials.append((f"catver-{cv}",
                         pdfgen.make_catalog_version_pdf(cv)))
    for variant in pdfgen.FORMINFO_VARIANTS:
        specials.append((f"forminfo-{variant}",
                         pdfgen.make_forminfo_pdf(variant)))
    for variant in pdfgen.INFO_TYPED_VARIANTS:
        specials.append((f"infotyped-{variant}",
                         pdfgen.make_info_typed_pdf(variant)))
    specials.append(("broken-kid", pdfgen.make_broken_kid_pdf()))
    specials.append(("broken-kid-inherited",
                     pdfgen.make_broken_kid_inherited_pdf()))
    return cases + specials


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from pdf_parse_new_ray.pdfkernel import parse_pdf

    cases = build_cases(n_seeds)
    n_ok = 0
    failures = []
    for name, pdf in cases:
        ours = ours_full(parse_pdf, pdf)
        theirs = ref_full(pdf)
        field = full_mismatch(ours, theirs)
        if not field:
            n_ok += 1
        else:
            failures.append(name)
            print(f"MISMATCH {name} [{field}]: "
                  f"ours={str(ours[field])[:100]!r} "
                  f"ref={str(theirs[field])[:100]!r}")
    print(f"{n_ok}/{len(cases)} full-surface-exact (text+numpages+info+"
          f"metadata) vs live reference "
          f"({sum(1 for n, _ in cases if 'encrypted' in n or n.endswith('-enc'))} encrypted)")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
