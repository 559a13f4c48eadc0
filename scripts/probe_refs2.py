"""Live-node probes: Ref/Cmd/keyword elements INSIDE TJ arrays + array
error paths (Parser.getObj array loop parses each element with the full
getObj, so `int int R` folds to a Ref element; getTextContent's
showSpacedText drops every element that is neither string nor number,
pdf.worker.js:36888-36910; an unclosed array is a ParserEOFException ->
page stop keeping partial text)."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pdf_parse_new_spark.kernels import pdfb  # noqa: E402
from tests.test_node_differential import _assemble  # noqa: E402
from scripts.probe_coerce import run_node  # noqa: E402

H = b"BT /F1 12 Tf 100 700 Td (ab) Tj "

PROBES = [
    # Ref inside a TJ array: eats the two kerns, element dropped
    ("tj_ref", H + b"[(a) 5000 0 R (b)] TJ (z) Tj ET"),
    # control: the kerns apply without R
    ("tj_kerns", H + b"[(a) 5000 0 (b)] TJ (z) Tj ET"),
    # non-integer: no ref, kerns stay
    ("tj_ref_frac", H + b"[(a) 5000.5 0 R (b)] TJ (z) Tj ET"),
    # bareword command element: dropped
    ("tj_bareword", H + b"[(a) qq (b)] TJ (z) Tj ET"),
    # known-command element (Cmd object, still dropped)
    ("tj_known_cmd", H + b"[(a) Tz (b)] TJ (z) Tj ET"),
    # keyword elements: dropped
    ("tj_true", H + b"[(a) true (b)] TJ (z) Tj ET"),
    ("tj_null", H + b"[(a) null (b)] TJ (z) Tj ET"),
    # name element: dropped
    ("tj_name", H + b"[(a) /N (b)] TJ (z) Tj ET"),
    # zero kern: dropped (item !== 0)
    ("tj_zero", H + b"[(a) 0 (b)] TJ (z) Tj ET"),
    # unclosed array: ParserEOFException -> page stop, partial kept
    ("tj_unclosed", H + b"[(a) (b) Tj (z) Tj ET"),
    # stray ')' inside array: Lexer FormatError -> page stop
    ("tj_stray_paren", H + b"[(a) ) (b)] TJ (z) Tj ET"),
    # ']' with no '[' : Cmd "]" -> unknown -> operands kept
    ("stray_close", H + b"(q) ] 0 -40 Td (z) Tj ET"),
    # Ref as Do operand: name undefined -> skipped quietly?
    ("ref_do", H + b"5 0 R Do (z) Tj ET"),
    # Ref as gs operand
    ("ref_gs", H + b"5 0 R gs (z) Tj ET"),
    # trio split across an array boundary: no ref
    ("trio_split", H + b"5 0 [(a)] R TJ (z) Tj ET"),
    # R inside array with ints BEFORE the array: no trio
    ("trio_split2", H + b"5 0 [R (a)] TJ (z) Tj ET"),
    # trio entirely inside: [5 0 R] -> [Ref] -> all dropped
    ("tj_only_ref", H + b"[5000 0 R] TJ (z) Tj ET"),
    # nested array element: dropped (not string/number)
    ("tj_nested", H + b"[(a) [5000] (b)] TJ (z) Tj ET"),
    # dict element: dropped
    ("tj_dict", H + b"[(a) << /X 5000 >> (b)] TJ (z) Tj ET"),
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
