// Full-surface reference dump for the differential sweep: text PLUS
// numpages / numrender / info / parsed XMP metadata (getAll) as one
// JSON document.  Usage: node ref_full_runner.js <pdf> <out.json>
const fs = require('fs');
const PDF = require('/root/reference/lib/pdf-parse.js');
(async () => {
  const data = fs.readFileSync(process.argv[2]);
  const r = await PDF(data, {});
  const out = {
    text: r.text,
    numpages: r.numpages,
    numrender: r.numrender,
    info: r.info === undefined ? null : r.info,
    metadata: r.metadata ? r.metadata.getAll() : null,
    metadata_raw: r.metadata ? r.metadata.getRaw() : null,
  };
  fs.writeFileSync(process.argv[3], JSON.stringify(out));
})().catch(e => { console.error(e); process.exit(1); });
