"""CFF (FontFile3 / Type1C) built-in-encoding fidelity vs the LIVE
reference (ROADMAP round-5 candidate #1, pulled forward).

pdf.js parses the embedded CFF's charset (glyphId -> glyph name) and
Encoding (charcode -> glyphId) tables (CFFParser.parseCharsets /
parseEncoding, pdf.worker.js:15567-15700), combines them in
CFFFont._createBuiltInEncoding (pdf.worker.js:22110-22133), and amends
the font's toUnicode with the resulting glyph names for every charcode
the PDF-level encoding doesn't claim (adjustType1ToUnicode,
pdf.worker.js:27559 via convert at :29624).  kernels/cff.py mirrors
that chain; every fixture here runs through node (the actual
reference) and our parser and must be byte-equal.

Fixture coverage: custom encoding format 0 and 1 (+0x80 supplements),
charset formats 0 and 1, predefined (Standard) encoding, custom
String-INDEX SIDs vs standard SIDs, /Differences precedence, and the
symbolic/nonsymbolic default-encoding interaction.
"""

from __future__ import annotations

import os
import shutil
import struct

import pytest

from pdf_parse_new_spark.kernels import pdfb
from pdf_parse_new_spark.kernels.cff import cff_builtin_encoding
from pdf_parse_new_spark.kernels.cffdata import CFFStandardStrings
from tests.test_node_differential import REF, _run_differential
from tests.test_real_pdf import _assemble

requires_node = pytest.mark.skipif(
    shutil.which("node") is None or not os.path.exists(REF),
    reason="live-reference differential needs node + /root/reference",
)


def _idx(items: list[bytes]) -> bytes:
    if not items:
        return b"\x00\x00"
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    osz = 1 if offs[-1] < 256 else (2 if offs[-1] < 65536 else 3)
    out = struct.pack(">H", len(items)) + bytes([osz])
    for o in offs:
        out += o.to_bytes(osz, "big")
    return out + b"".join(items)


def _i29(v: int) -> bytes:
    return b"\x1d" + struct.pack(">i", v)


def _num(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    return _i29(v)


def build_cff(
    glyph_names: list[str],
    codes: list[int] | None = None,
    enc_fmt: int = 0,
    charset_fmt: int = 0,
    predefined_enc: int | None = None,
    supplement: list[tuple[int, str]] | None = None,
    ros: bool = False,
) -> bytes:
    """Minimal parser-clean CFF: glyph 0 is .notdef, glyphs 1..n carry
    `glyph_names` (standard SIDs where possible, else String-INDEX
    customs) and bare-endchar charstrings.  `codes` assigns charcodes
    to glyphs 1..n via encoding format `enc_fmt`; `predefined_enc`
    selects Standard (0) / Expert (1) instead; `supplement` appends
    (code, glyphname) supplements behind the 0x80 format bit."""
    header = b"\x01\x00\x04\x04"
    name_index = _idx([b"FakeCFF"])
    strings: list[bytes] = []
    sids: list[int] = []
    for nm in glyph_names:
        if nm in CFFStandardStrings:
            sids.append(CFFStandardStrings.index(nm))
        else:
            sids.append(391 + len(strings))
            strings.append(nm.encode("latin-1"))
    sup_sids: list[int] = []
    for _, nm in supplement or ():
        b = nm.encode("latin-1")
        if nm in CFFStandardStrings:
            sup_sids.append(CFFStandardStrings.index(nm))
        elif b in strings:
            sup_sids.append(391 + strings.index(b))
        else:
            sup_sids.append(391 + len(strings))
            strings.append(b)
    string_index = _idx(strings)
    gsubr_index = _idx([])

    if predefined_enc is not None:
        enc_data = b""
    else:
        if enc_fmt == 0:
            enc_data = bytes([0x80 if supplement else 0, len(codes)])
            enc_data += bytes(codes)
        else:  # format 1: one contiguous range
            enc_data = bytes(
                [0x81 if supplement else 1, 1, codes[0], len(codes) - 1]
            )
        if supplement:
            enc_data += bytes([len(supplement)])
            for (code, _), sid in zip(supplement, sup_sids):
                enc_data += bytes([code]) + struct.pack(">H", sid)

    if charset_fmt == 0:
        cs_data = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    else:  # format 1: one range per consecutive-SID run
        runs: list[tuple[int, int]] = []
        for s in sids:
            if runs and runs[-1][0] + runs[-1][1] + 1 == s:
                runs[-1] = (runs[-1][0], runs[-1][1] + 1)
            else:
                runs.append((s, 0))
        cs_data = b"\x01" + b"".join(
            struct.pack(">HB", first, nleft) for first, nleft in runs
        )

    charstrings = _idx([b"\x0e"] * (len(glyph_names) + 1))  # endchar
    private = bytes([248, 136, 20]) + bytes([248, 136, 21])  # dW/nW 500

    def topdict(enc_off, cs_off, chs_off, priv_off):
        d = b""
        if ros:
            d += _num(391) + _num(392) + _num(0) + b"\x0c\x1e"
        d += _i29(cs_off) + b"\x0f"
        d += _i29(
            predefined_enc if predefined_enc is not None else enc_off
        ) + b"\x10"
        d += _i29(chs_off) + b"\x11"
        d += _num(len(private)) + _i29(priv_off) + b"\x12"
        return d

    td_size = len(_idx([topdict(0, 0, 0, 0)]))
    base = (
        len(header) + len(name_index) + td_size + len(string_index)
        + len(gsubr_index)
    )
    enc_off = base
    cs_off = enc_off + len(enc_data)
    chs_off = cs_off + len(cs_data)
    priv_off = chs_off + len(charstrings)
    td = _idx([topdict(enc_off, cs_off, chs_off, priv_off)])
    assert len(td) == td_size
    return (
        header + name_index + td + string_index + gsubr_index
        + enc_data + cs_data + charstrings + private
    )


def cff_pdf(
    cff: bytes, text: bytes = b"ABC", diffs: bytes = b"", flags: int = 4
) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /FakeCFF "
           b"/FirstChar 65 /LastChar 90 /Widths 8 0 R "
           + diffs + b"/FontDescriptor 6 0 R >>",
        6: b"<< /Type /FontDescriptor /FontName /FakeCFF /Flags %d "
           b"/FontBBox [0 -200 1000 800] /ItalicAngle 0 /Ascent 800 "
           b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile3 7 0 R >>"
           % flags,
        7: b"<< /Subtype /Type1C /Length %d >>\nstream\n%s\nendstream"
           % (len(cff), cff),
        8: b"[" + b" ".join(b"500" for _ in range(26)) + b"]",
    }
    ops = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (%s) Tj ET" % text
    objs[4] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
    return _assemble(objs)


@requires_node
def test_cff_builtin_encoding_byte_equal_vs_live_reference(tmp_path):
    _run_differential(
        tmp_path,
        [
            # custom encoding fmt 0, charset fmt 0, String-INDEX SIDs
            cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                              codes=[65, 66, 67])),
            # encoding fmt 1 range + charset fmt 1, standard SIDs
            cff_pdf(build_cff(["exclam", "quotedbl", "numbersign"],
                              codes=[65, 66, 67],
                              enc_fmt=1, charset_fmt=1)),
            # 0x80 supplement bit: code 68 re-points at glyph "beta"
            cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                              codes=[65, 66, 67],
                              supplement=[(68, "beta")]),
                    text=b"ABCD"),
            # predefined Standard encoding: germandbls sits at 251
            cff_pdf(build_cff(["germandbls", "alpha"], predefined_enc=0),
                    text=b"\xfbA"),
            # /Differences claims 66: builtin loses there, wins at 65/67
            cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                              codes=[65, 66, 67]),
                    diffs=b"/Encoding << /Differences [ 66 /B ] >> "),
            # nonsymbolic flags: Standard default, builtin still amends
            cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                              codes=[65, 66, 67]), flags=32),
        ],
    )


def test_cff_builtin_encoding_unit():
    """No-node sanity on the raw table reader."""
    enc = cff_builtin_encoding(
        build_cff(["alpha", "beta", "uni0416"], codes=[65, 66, 67])
    )
    assert enc == {65: "alpha", 66: "beta", 67: "uni0416"}
    # supplement overrides ride the 0x80 format bit
    enc = cff_builtin_encoding(
        build_cff(["alpha", "beta"], codes=[65, 66],
                  supplement=[(70, "beta")])
    )
    assert enc == {65: "alpha", 66: "beta", 70: "beta"}
    # predefined Standard: position of the glyph name in StandardEncoding
    enc = cff_builtin_encoding(
        build_cff(["germandbls", "alpha"], predefined_enc=0)
    )
    assert enc == {251: "germandbls"}
    # CID-keyed (/ROS present) parses encoding = null -> None
    assert cff_builtin_encoding(
        build_cff(["alpha"], codes=[65], ros=True)
    ) is None
    # garbage in -> None, never a raise
    assert cff_builtin_encoding(b"") is None
    assert cff_builtin_encoding(b"\x02\x00\x04\x04") is None


def test_cff_decode_end_to_end():
    """Engine-side sanity without node: the builtin encoding reaches
    the text output through build_font_map's cff branch."""
    out = pdfb.parse_pdf_bytes(
        cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                          codes=[65, 66, 67]))
    )
    assert out["text"].endswith("αβЖ")
    # /Differences precedence at code 66
    out = pdfb.parse_pdf_bytes(
        cff_pdf(build_cff(["alpha", "beta", "uni0416"],
                          codes=[65, 66, 67]),
                diffs=b"/Encoding << /Differences [ 66 /B ] >> ")
    )
    assert out["text"].endswith("αBЖ")
