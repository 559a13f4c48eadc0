"""Distilled live-node probes for the inline-image (BI/ID/EI) vein.

pdf.js v4.5.136 ends an inline image with findDefaultInlineStreamEnd
(pdf.worker.js:13449-13536): a bare E,I byte scan (no whitespace required
BEFORE the marker) followed by SPACE/LF/CR (not tab!), a 15-byte
printable-ASCII window check, and a mini-lexer walk that must reach a
KNOWN command with matching arity.  Filtered inline images use dedicated
end finders (AHx -> '>', A85 -> '~>', DCT -> JPEG markers) followed by
inlineStreamSkipEI, which stops after the next "EI" ANYWHERE (worker:
13668-13683).  Our current model is a single re.search(rb"\\sEI\\b").

Usage:  python scripts/probe_inline.py [adhoc-stream ...]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pdf_parse_new_spark.kernels import pdfb  # noqa: E402
from tests.test_node_differential import _assemble  # noqa: E402
from scripts.probe_coerce import run_node  # noqa: E402

H = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (pre) Tj "
T = b" (tail) Tj ET"
DICT = b"BI /W 2 /H 2 /BPC 8 /CS /G ID"

PROBES = [
    # baseline: ws both sides, clean window
    ("base_ws", H + DICT + b" \x01\x02\x03\x04 EI Q" + T),
    # data glued to EI (no whitespace before the marker)
    ("no_ws_before_ei", H + DICT + b" \x41\x42EI Q" + T),
    # EI followed by a delimiter: pdf.js needs SPACE/LF/CR after I
    ("ei_delim_after", H + DICT + b" \x01\x02 EI(mid) Tj EI Q" + T),
    # EI followed by TAB (our \s accepts, pdf.js doesn't)
    ("ei_tab_after", H + DICT + b" \x01\x02 EI\t(mid) Tj EI Q" + T),
    # non-ASCII byte inside the 15-byte window rejects the candidate
    ("ei_nonascii_window", H + DICT + b" \x01\x02 EI \xff\xff\xff (mid) Tj EI Q" + T),
    # unknown command in the window rejects
    ("ei_unknown_cmd", H + DICT + b" \x01\x02 EI zzgw (mid) Tj EI Q" + T),
    # known command with matching arity in the window accepts (control)
    ("ei_arity_ok", H + DICT + b" \x01\x02 EI 1 2 3 Tc (m) Tj EI Q" + T),
    # window truncates the command token -> unknown -> reject
    ("ei_arity_window_eof", H + DICT + b" \x01\x02 EI 12345 678901 Tqq (m) Tj EI Q" + T),
    # single rejected candidate + EOF -> recovery to the last candidate
    ("ei_eof_recovery", H + DICT + b" \x01\x02 EI \xff\xff\xff\xff" + T),
    # no EI at all: rest of page swallowed (control)
    ("ei_no_candidate", H + DICT + b" \x01\x02 XY (mid) Tj ET"),
    # NUL pair in window rejects; NUL + printable is allowed
    ("ei_nul_nul_window", H + DICT + b" \x01 EI \x00\x00 (mid) Tj EI Q" + T),
    ("ei_nul_one_window", H + DICT + b" \x01 EI \x00Q (mid) Tj EI Q" + T),
    # non-Name dict key -> FormatError -> page stop, partial text kept
    ("bi_junk_dict_key", H + b"BI 5 ID \x01 EI Q" + T),
    ("bi_junk_key_late", H + b"BI /W 1 (k) ID \x01 EI Q" + T),
    # junk VALUES are fine (control)
    ("bi_junk_dict_val", H + b"BI /W (q) /H << /A 5 >> ID \x01\x02 EI Q" + T),
    # pending operand before BI survives into the stash at EI(1 arg)
    ("pending_operand_bi", H + b"5 " + DICT + b" \x01 EI Tc (ga mma) Tj ET"),
    # AHx: end at '>', then skip to next EI anywhere
    ("ahx_control", H + b"BI /W 2 /H 2 /BPC 8 /CS /G /F /AHx ID 00010203> EI Q" + T),
    ("ahx_ei_inside", H + b"BI /W 2 /H 2 /BPC 8 /CS /G /F /AHx ID 00 EI (mid) Tj 0203> EI Q" + T),
    # A85: end at '~>', then skip to next EI anywhere
    ("a85_control", H + b"BI /W 1 /H 1 /BPC 8 /CS /G /F /A85 ID ;Rr~> EI Q" + T),
    ("a85_ei_inside", H + b"BI /W 1 /H 1 /BPC 8 /CS /G /F /A85 ID ;R EI (mid) Tj ~> EI Q" + T),
    # DCT: end at JPEG EOI, then skip to next EI anywhere
    ("dct_control", H + b"BI /W 1 /H 1 /BPC 8 /CS /G /F /DCT ID \xff\xd8\xff\xd9 EI Q" + T),
    ("dct_ei_inside", H + b"BI /W 1 /H 1 /BPC 8 /CS /G /F /DCT ID \xff\xd8 EI (mid) Tj \xff\xd9 EI Q" + T),
    # no whitespace after ID: first data byte lands in lexer.currentChar
    ("id_no_ws_cmd", H + DICT + b"\x41\x42 EI Q" + T),
    ("id_no_ws_paren", H + DICT + b"(AB EI Q" + T),
]


def main() -> int:
    if len(sys.argv) > 1:
        probes = [(f"adhoc{i}", s.encode()) for i, s in enumerate(sys.argv[1:])]
    else:
        probes = PROBES
    pdfs = {name: _assemble(stream) for name, stream in probes}
    ref = run_node(pdfs)
    bad = 0
    for name, _ in probes:
        try:
            ours = pdfb.parse_pdf_bytes(pdfs[name])["text"]
        except Exception as e:  # noqa: BLE001
            ours = f"<<OURS-ERR>> {e!r}"
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
