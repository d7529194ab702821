import os
import subprocess

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Seeded sf0.001 corpus under /tmp (generated once, cached)."""
    from pdf_parse_new_ray.fixtures.corpus import corpus_dir_for

    return corpus_dir_for(0.001)


@pytest.fixture(scope="session")
def html_corpus():
    """Seeded mixed pdf+html sf0.001 corpus under /tmp (cached)."""
    from pdf_parse_new_ray.fixtures.corpus import html_corpus_dir_for

    return html_corpus_dir_for(0.001)


REF_DATA = "/root/reference/test/data"
REF_OUT = "/tmp/refdump/pytest-ref"


@pytest.fixture(scope="session")
def reference_outputs():
    """Fresh outputs of the reference engine on its own test PDFs (the
    committed .txt goldens are stale — SURVEY §5).  Skips if node or the
    reference checkout is unavailable."""
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference checkout not available")
    os.makedirs(REF_OUT, exist_ok=True)
    runner = os.path.join(REF_OUT, "run_ref.js")
    if not os.path.exists(runner):
        with open(runner, "w") as f:
            f.write(
                "const fs=require('fs');"
                "const PDF=require('/root/reference/lib/pdf-parse.js');"
                "(async()=>{const d=fs.readFileSync(process.argv[2]);"
                "const r=await PDF(d,{});fs.writeFileSync(process.argv[3],r.text);})()"
                ".catch(e=>{console.error(e);process.exit(1);});"
            )
    outs = {}
    for name in ("01-valid", "02-valid", "04-valid", "05-versions-space"):
        out = os.path.join(REF_OUT, f"{name}.txt")
        if not os.path.exists(out):
            try:
                subprocess.run(
                    ["node", runner, os.path.join(REF_DATA, f"{name}.pdf"), out],
                    check=True, capture_output=True, timeout=300,
                )
            except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
                pytest.skip("node / reference engine unavailable")
        with open(out, encoding="utf-8") as f:
            outs[name] = f.read()
    return outs
