"""Live-node probes: `int int R` operand triples in CONTENT streams.

pdf.js's EvaluatorPreprocessor reads through Parser.getObj, which forms a
Ref from `Number.isInteger(buf1) && Number.isInteger(buf1') && Cmd "R"`
(pdf.worker.js:13432-13438) — in ANY stream, content included. Our
operand model keeps two ints and treats R as an unknown command. The Ref
is a JS object: ToString() is "5R" / "5R2" (gen appended only when
nonzero), ToNumber NaN.

Usage: python scripts/probe_refs.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pdf_parse_new_spark.kernels import pdfb  # noqa: E402
from tests.test_node_differential import _assemble  # noqa: E402
from scripts.probe_coerce import run_node  # noqa: E402

H = b"BT /F1 12 Tf 100 700 Td (ab) Tj "

PROBES = [
    # Ref swallows two ints: Td underflows (1 operand) -> skipped
    ("ref_td_underflow", H + b"5 -40 R Td (z) Tj ET"),
    # control: non-integer first int -> NO ref, R unknown keeps operands
    ("ref_frac_control", H + b"1.5 -40 R Td (z) Tj ET"),
    # JS Number.isInteger(0.0) is true: "0.0" still forms a Ref
    ("ref_float_int", H + b"5 -40.0 R Td (z) Tj ET"),
    # Ref INTO a numeric slot: Tc = Ref -> NaN charSpacing
    ("ref_tc_nan", H + b"3 0 R Tc (cd) Tj ET"),
    # stash: [8,9,Ref] -> Td sheds 8 -> Td(9, Ref) -> NaN y leg
    ("ref_td_stash", H + b"8 9 2 0 R Td (z) Tj ET"),
    # quote spacing: aw = Ref -> wordSpacing NaN / concat "7R"
    ("ref_quote_aw", H + b"40 TL 7 0 R 2 (q) \" (z) Tj ET"),
    # nonzero gen: ToString "5R2"
    ("ref_show_poison", H + b"5 2 R Tj (5R2) Tj (k) Tj ET"),
    ("ref_show_poison0", H + b"5 0 R Tj (5R) Tj (k) Tj ET"),
    # R NOT preceded by two ints: unknown command keeps operands
    ("r_unknown_str", H + b"(x) R 0 -40 Td (z) Tj ET"),
    ("r_one_int", H + b"7 R 0 -40 Td (z) Tj ET"),
    # RG stays one command (longest-prefix; no R confusion)
    ("rg_command", H + b"1 0 0 RG 0 -40 Td (z) Tj ET"),
    # Ref into Tm cell
    ("ref_tm_cell", H + b"1 0 0 1 50 3 0 R Tm (z) Tj ET"),
    # Ref as Tf size
    ("ref_tf_size", H + b"/F1 3 0 R Tf (z) Tj ET"),
    # chained: 1 0 R 2 0 R -> two refs
    ("ref_two", H + b"1 0 R 2 0 R Td (z) Tj ET"),
    # negative gen int
    ("ref_neg_gen", H + b"5 -1 R Tc (cd) Tj ET"),
]


def main() -> int:
    pdfs = {name: _assemble(stream) for name, stream in PROBES}
    ref = run_node(pdfs)
    bad = 0
    for name, _ in PROBES:
        try:
            ours = pdfb.parse_pdf_bytes(pdfs[name])["text"]
        except Exception as e:  # noqa: BLE001
            ours = f"<<OURS-ERR>> {e!r}"
        if ours != ref[name]:
            bad += 1
            print(f"DIV {name}\n  ref : {ref[name]!r}\n  ours: {ours!r}")
        else:
            print(f"OK  {name}  {ref[name]!r}")
    print(f"\n{bad}/{len(PROBES)} divergent")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
