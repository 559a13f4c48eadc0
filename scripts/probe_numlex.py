"""Live-node probes: Lexer.getNumber tokenization quirks in content
streams (pdf.worker.js:13958-14031): e-notation ("1e2" is ONE token,
value 100), mid-token minus ("5-6" warns and reads 56), a sign followed
by CR/LF then digits ("-\\n5" is -5), sign/dot followed by whitespace is
a GRACEFUL 0 operand, sign/dot followed by anything else THROWS
FormatError (page stop keeping partial text). Our _NUMBER regex splits
these into several tokens."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pdf_parse_new_spark.kernels import pdfb  # noqa: E402
from tests.test_node_differential import _assemble  # noqa: E402
from scripts.probe_coerce import run_node  # noqa: E402

H = b"BT /F1 12 Tf 100 700 Td (ab) Tj "

PROBES = [
    # e-notation: one token, Td(0, -4e1) drops a line
    ("e_notation", H + b"0 -4e1 Td (z) Tj ET"),
    ("e_notation_plus", H + b"0 -4E+1 Td (z) Tj ET"),
    ("e_notation_tc", H + b"3e0 Tc (cd) Tj ET"),
    # "1e" with no digits: number 1, then command token "e"
    ("e_dangling", H + b"0 -40 Td 1e (z) Tj ET"),
    # "1e+" sign consumed, power 0 -> value 1
    ("e_sign_dangling", H + b"5e+ Tc (cd) Tj ET"),
    # mid-minus: 5-6 == 56 (one token)
    ("mid_minus", H + b"0 5-6 Td (z) Tj ET"),
    ("mid_minus_tc", H + b"1-5 Tc (cd) Tj ET"),
    # sign + newline + digits: one token
    ("sign_newline", H + b"0 -\n40 Td (z) Tj ET"),
    # double minus
    ("double_minus", H + b"0 --40 Td (z) Tj ET"),
    # graceful zero: "+ " is a 0 operand (shifts arity!)
    ("plus_space_zero", H + b"0 -40 + Td (z) Tj ET"),
    ("dot_space_zero", H + b"0 -40 . Td (z) Tj ET"),
    # throw: "+x" FormatError -> page stop, partial text kept
    ("plus_throw", H + b"+x 0 -40 Td (z) Tj ET"),
    ("dot_throw", H + b".q 0 -40 Td (z) Tj ET"),
    ("minus_delim_throw", H + b"-(a) Tj 0 -40 Td (z) Tj ET"),
    # "5.e1": dot then e-notation continues the token
    ("dot_e", H + b"0 -4.e1 Td (z) Tj ET"),
    # second dot breaks the token: "1.2.3" = 1.2 then .3
    ("two_dots", H + b"0 1.2.3 Td (z) Tj ET"),
    # e-notation inside TJ kern
    ("tj_e_kern", H + b"[(a) 5e3 (b)] TJ (z) Tj ET"),
    # mid-minus inside TJ kern
    ("tj_mid_minus", H + b"[(a) 5-3 (b)] TJ (z) Tj ET"),
    # graceful-zero in array: [+ ] -> 0 element (dropped kern)
    ("tj_plus_zero", H + b"[(a) + (b)] TJ (z) Tj ET"),
    # throw in array
    ("tj_dot_throw", H + b"[(a) .q (b)] TJ (z) Tj ET"),
    # e-notation forming a Ref gen: 1 0e0 R folds
    ("ref_e_gen", H + b"5 0e0 R Td (z) Tj ET"),
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
