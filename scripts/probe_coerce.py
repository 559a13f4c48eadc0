"""Distilled live-node probes for the JS value-coercion vein.

Feeds single content streams to BOTH the live reference and our engine and
prints a side-by-side diff. Usage:

    python scripts/probe_coerce.py            # run the built-in probe set
    python scripts/probe_coerce.py 'BT ... ET'  # one ad-hoc stream
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pdf_parse_new_spark.kernels import pdfb  # noqa: E402
from tests.test_node_differential import REF, _assemble  # noqa: E402

PROBES = [
    # (label, content-stream)
    ("tc_str_numeric", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (5) Tc (gamma) Tj ET"),
    ("tc_arr_single", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm [5] Tc (gamma) Tj ET"),
    ("tc_arr_multi", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm [1 2] Tc (gamma) Tj ET"),
    ("tc_dict", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm << /X 1 >> Tc (gamma) Tj ET"),
    ("tc_junk_str", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) Tc (gamma) Tj ET"),
    ("tc_name", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm /Five Tc (gamma) Tj ET"),
    ("tw_str", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (7) Tw (a b c) Tj ET"),
    ("tl_arr", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm [5] TL (alpha) Tj T* (beta) Tj ET"),
    ("tl_junk_quote", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) TL (alpha) Tj (beta) ' ET"),
    ("tz_str_num", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (50) Tz (gamma) Tj ET"),
    ("tz_junk", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) Tz (gamma) Tj (beta) Tj ET"),
    ("ts_junk", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) Ts (gamma) Tj (beta) Tj ET"),
    ("td_junk_x", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (alpha) Tj (xy) 5 Td (beta) Tj ET"),
    ("td_junk_y", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (alpha) Tj 5 (xy) Td (beta) Tj ET"),
    ("tdcap_junk_y", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (alpha) Tj 5 (xy) TD (beta) Tj T* (rho) Tj ET"),
    ("tm_junk_e", b"BT /F1 10 Tf (alpha) Tj 1 0 0 1 (xy) 700 Tm (beta) Tj (rho) Tj ET"),
    ("tm_junk_a", b"BT /F1 10 Tf (xy) 0 0 1 72 700 Tm (beta) Tj (rho) Tj ET"),
    ("tf_junk_size", b"BT /F1 (xy) Tf 1 0 0 1 72 700 Tm (gamma) Tj (beta) Tj ET"),
    ("tf_str_size", b"BT /F1 (12) Tf 1 0 0 1 72 700 Tm (gamma) Tj (beta) Tj ET"),
    ("quote2_junk", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm 12 TL (xy) (7) (gamma) \" (beta) Tj ET"),
    ("tc_then_clear", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) Tc (gamma) Tj 0 Tc (beta) Tj ET"),
    ("tc_str_tj_kern", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (5) Tc [(ga) -120 (mma)] TJ ET"),
    ("tw_junk_spaces", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (xy) Tw (a b) Tj ET"),
    ("tc_empty_str", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm () Tc (gamma) Tj ET"),
    ("tc_arr_empty", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm [] Tc (gamma) Tj ET"),
    ("tc_spacey_str", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm ( 5 ) Tc (gamma) Tj ET"),
    ("tc_neg_str", b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (-3) Tc (gamma) Tj ET"),
    ("cm_junk_a", b"q (xy) 0 0 1 0 0 cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (gamma) Tj ET Q"),
    ("cm_str_e", b"q 1 0 0 1 (5) 0 cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (gamma) Tj (beta) Tj ET Q"),
    ("cm_arr_a", b"q [2] 0 0 1 0 0 cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (gamma) Tj ET Q"),
    ("cm_name_f", b"q 1 0 0 1 0 /Five cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (gamma) Tj (beta) Tj ET Q"),
    ("cm_bool_a", b"q true 0 0 1 0 0 cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (gamma) Tj ET Q"),
    ("cm_junk_e_lines", b"q 1 0 0 1 (xy) 20 cm BT /F1 10 Tf 1 0 0 1 72 700 Tm (al be) Tj 0 -20 Td (ga de) Tj ET Q"),
]


def run_node(pdfs: dict[str, bytes]) -> dict[str, str]:
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        paths = {}
        for name, pdf in pdfs.items():
            p = tdp / f"{name}.pdf"
            p.write_bytes(pdf)
            paths[str(p)] = name
        harness = tdp / "run.js"
        harness.write_text(
            """
const fs = require("fs");
const pdfParse = require(%s);
(async () => {
  const out = {};
  for (const p of process.argv.slice(2)) {
    try { out[p] = (await pdfParse(fs.readFileSync(p))).text; }
    catch (e) { out[p] = "<<ERR>> " + e.message; }
  }
  console.log(JSON.stringify(out));
})();
"""
            % json.dumps(REF)
        )
        res = subprocess.run(
            ["node", str(harness), *paths], capture_output=True, text=True,
            timeout=300,
        )
        assert res.returncode == 0, res.stderr[-1000:]
        raw = json.loads(res.stdout.strip().splitlines()[-1])
        return {paths[p]: t for p, t in raw.items()}


def main() -> int:
    if len(sys.argv) > 1:
        probes = [(f"adhoc{i}", s.encode()) for i, s in enumerate(sys.argv[1:])]
    else:
        probes = PROBES
    pdfs = {name: _assemble(stream) for name, stream in probes}
    ref = run_node(pdfs)
    bad = 0
    for name, _ in probes:
        ours = pdfb.parse_pdf_bytes(pdfs[name])["text"]
        mark = "OK " if ours == ref[name] else "DIV"
        if ours != ref[name]:
            bad += 1
            print(f"{mark} {name}\n  ref : {ref[name]!r}\n  ours: {ours!r}")
        else:
            print(f"{mark} {name}  {ref[name]!r}")
    print(f"\n{bad}/{len(probes)} divergent")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
