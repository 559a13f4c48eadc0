"""Embedded-font-program and encoding-selection fidelity vs the LIVE
reference (VERDICT r3 missing #2).

pdf.js's simple-font text chain (mirrored by pdfb.build_font_map):

- default-encoding selection (pdf.worker.js:37180-37232): Standard /
  WinAnsi-for-TrueType / MacRoman-for-symbolic, SymbolSet / ZapfDingbats
  / WinAnsi for the non-embedded Symbol / Dingbats / Wingdings families;
- _simpleFontToUnicode glyph-name resolution over the full Adobe Glyph
  List + subset-name heuristics (kernels/encodings.py carries the
  worker's own data tables);
- adjustTrueTypeToUnicode (pdf.worker.js:27514): a symbolic TrueType
  whose `name` table has ONLY Windows records decodes through WinAnsi;
- adjustType1ToUnicode (pdf.worker.js:27559): the embedded Type1
  program's built-in /Encoding glyph names win for unclaimed charcodes;
- missing-file Type1 space substitution (pdf.worker.js:29779-29786):
  empty-named charcodes of non-embedded Type1 fonts read as spaces.

Every fixture here runs through node (the actual reference) and our
parser; outputs must be byte-equal.
"""

from __future__ import annotations

import os
import shutil
import struct

import pytest

from pdf_parse_new_spark.kernels import pdfb
from tests.test_node_differential import REF, _run_differential
from tests.test_real_pdf import _assemble

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not os.path.exists(REF),
    reason="live-reference differential needs node + /root/reference",
)


def _checksum(data: bytes) -> int:
    data = data + b"\0" * (-len(data) % 4)
    return sum(struct.unpack(">%dI" % (len(data) // 4), data)) & 0xFFFFFFFF


def _name_table(records) -> bytes:
    storage = b""
    recs = b""
    for plat, enc, lang, nid, s in records:
        recs += struct.pack(">6H", plat, enc, lang, nid, len(s),
                            len(storage))
        storage += s
    return (
        struct.pack(">3H", 0, len(records), 6 + 12 * len(records))
        + recs + storage
    )


def _cmap_f4(mapping) -> bytes:
    segs = sorted(mapping)
    ends = segs + [0xFFFF]
    starts = segs + [0xFFFF]
    deltas = [(mapping[c] - c) & 0xFFFF for c in segs] + [1]
    n = len(ends)
    pow2 = 2 ** (n.bit_length() - 1)
    sub = struct.pack(">7H", 4, 16 + 8 * n, 0, n * 2, 2 * pow2,
                      n.bit_length() - 1, 2 * n - 2 * pow2)
    sub += struct.pack(">%dH" % n, *ends) + b"\0\0"
    sub += struct.pack(">%dH" % n, *starts)
    sub += struct.pack(">%dH" % n, *deltas)
    sub += struct.pack(">%dH" % n, *([0] * n))
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub


def build_ttf(win_names: bool) -> bytes:
    """Minimal sanitizer-surviving TrueType: empty glyphs, a (3,1)
    format-4 cmap, and a name table with either Windows-only or
    Mac-only records (the adjustTrueTypeToUnicode discriminator)."""
    nglyphs = 3
    head = struct.pack(">IIIIHHQQhhhhHHhhh", 0x00010000, 0, 0,
                       0x5F0F3CF5, 0, 1000, 0, 0, 0, 0, 1000, 1000,
                       0, 3, 2, 0, 0)
    hhea = struct.pack(">IhhhHhhhhhhhhhhhH", 0x00010000, 800, -200, 0,
                       1000, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, nglyphs)
    maxp = struct.pack(">IH", 0x00010000, nglyphs) + b"\0" * 26
    hmtx = struct.pack(">HhHhHh", 500, 0, 600, 0, 600, 0)
    glyf = b"\0" * 4
    loca = struct.pack(">%dH" % (nglyphs + 1), 0, 0, 0, 0)
    post = struct.pack(">IIhhIIIII", 0x00030000, 0, 0, 0, 0, 0, 0, 0, 0)
    if win_names:
        recs = [(3, 1, 0x409, 1, "FakeSym".encode("utf-16-be")),
                (3, 1, 0x409, 6, "FakeSym".encode("utf-16-be"))]
    else:
        recs = [(1, 0, 0, 1, b"FakeSym"), (1, 0, 0, 6, b"FakeSym")]
    tables = [
        (b"cmap", _cmap_f4({0x41: 1, 0x42: 2})), (b"glyf", glyf),
        (b"head", head), (b"hhea", hhea), (b"hmtx", hmtx),
        (b"loca", loca), (b"maxp", maxp), (b"name", _name_table(recs)),
        (b"post", post),
    ]
    n = len(tables)
    sr = 2 ** (n.bit_length() - 1) * 16
    out = struct.pack(">IHHHH", 0x00010000, n, sr,
                      (sr // 16).bit_length() - 1, n * 16 - sr)
    off = 12 + 16 * n
    dirs = b""
    body = b""
    for tag, data in tables:
        dirs += struct.pack(">4sIII", tag, _checksum(data), off,
                            len(data))
        pad = b"\0" * (-len(data) % 4)
        body += data + pad
        off += len(data) + len(pad)
    return out + dirs + body


T1_PROGRAM = b"""%!PS-AdobeFont-1.0: FakeT1 001.001
/FontName /FakeT1 def
/Encoding 256 array
0 1 255 {1 index exch /.notdef put} for
dup 65 /alpha put
dup 66 /beta put
dup 67 /uniFB01 put
dup 68 /gamma put
readonly def
/FontMatrix [0.001 0 0 0.001 0 0] readonly def
/FontBBox {0 -200 1000 800} readonly def
currentdict end
currentfile eexec
0000000000000000000000000000000000000000000000000000000000000000
cleartomark
"""


def _ttf_pdf(ttf: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /TrueType /BaseFont /FakeSym "
           b"/FirstChar 65 /LastChar 255 /Widths 8 0 R "
           b"/FontDescriptor 6 0 R >>",
        6: b"<< /Type /FontDescriptor /FontName /FakeSym /Flags 4 "
           b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
           b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile2 7 0 R >>",
        7: b"<< /Length %d /Length1 %d >>\nstream\n%s\nendstream"
           % (len(ttf), len(ttf), ttf),
        8: b"[" + b" ".join(b"500" for _ in range(191)) + b"]",
    }
    ops = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ABC \x93quote\x94) Tj ET"
    objs[4] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
    return _assemble(objs)


def _t1_pdf(with_diffs: bool) -> bytes:
    enc = (b"/Encoding << /Differences [ 66 /B ] >> " if with_diffs
           else b"")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /FakeT1 "
           b"/FirstChar 65 /LastChar 68 /Widths [500 500 500 500] "
           + enc + b"/FontDescriptor 6 0 R >>",
        6: b"<< /Type /FontDescriptor /FontName /FakeT1 /Flags 4 "
           b"/FontBBox [0 -200 1000 800] /ItalicAngle 0 /Ascent 800 "
           b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile 7 0 R >>",
        7: b"<< /Length %d /Length1 %d /Length2 0 /Length3 0 >>"
           b"\nstream\n%s\nendstream"
           % (len(T1_PROGRAM), len(T1_PROGRAM), T1_PROGRAM),
    }
    ops = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ABCD) Tj ET"
    objs[4] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
    return _assemble(objs)


def _bare_font_pdf(base_font: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /" + base_font
           + b" >>",
    }
    ops = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (abg \xd6\x96) Tj ET"
    objs[4] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
    return _assemble(objs)


def test_font_program_paths_byte_equal_vs_live_reference(tmp_path):
    _run_differential(
        tmp_path,
        [
            _ttf_pdf(build_ttf(True)),    # win names -> WinAnsi amend
            _ttf_pdf(build_ttf(False)),   # mac names -> MacRoman default
            _t1_pdf(False),               # builtin /Encoding names
            _t1_pdf(True),                # /Differences beats builtin
            _bare_font_pdf(b"Symbol"),        # SymbolSetEncoding
            _bare_font_pdf(b"ZapfDingbats"),  # ZapfDingbatsEncoding
            _bare_font_pdf(b"Helvetica"),     # empty names -> spaces
        ],
    )


def test_symbolic_ttf_win_names_decode_winansi():
    """Sanity without node: 0x93/0x94 decode to curly quotes through
    the WinAnsi amendment; the mac-records twin keeps MacRoman."""
    win = pdfb.parse_pdf_bytes(_ttf_pdf(build_ttf(True)))
    mac = pdfb.parse_pdf_bytes(_ttf_pdf(build_ttf(False)))
    assert win["text"].endswith("ABC “quote”")
    assert mac["text"].endswith("ABC ìquoteî")
