"""Minimal CFF (Compact Font Format, FontFile3 /Type1C) table reader.

Only the tables the TEXT chain needs: header -> Name INDEX -> Top DICT
INDEX -> String INDEX, then the charset (glyphId -> glyph name) and
Encoding (charcode -> glyphId) referenced by the Top DICT.  The output
is the charcode -> glyph-name "built-in encoding" map that pdf.js
computes in CFFFont._createBuiltInEncoding (pdf.worker.js:22110-22133,
parser at :15098-15700) and feeds to adjustType1ToUnicode — charstring
outlines, subrs and the compiler are deliberately out of scope (the
engine never rasterizes).

Spec data (standard strings, predefined encodings/charsets) lives in
kernels/cffdata.py, generated from the worker's own tables.
"""

from __future__ import annotations

from pdf_parse_new_spark.kernels import cffdata as _d
from pdf_parse_new_spark.kernels.encodings import StandardEncoding

_NUM_STD = 391  # NUM_STANDARD_CFF_STRINGS


class CFFError(ValueError):
    pass


def _index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX: ([item bytes...], endPos). pdf.js parseIndex."""
    if pos + 2 > len(data):
        raise CFFError("index header out of bounds")
    count = (data[pos] << 8) | data[pos + 1]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CFFError("bad offSize")
    start = pos + (count + 1) * off_size - 1
    offs = []
    for _ in range(count + 1):
        offs.append(start + int.from_bytes(data[pos : pos + off_size], "big"))
        pos += off_size
    if offs[-1] > len(data):
        raise CFFError("index data out of bounds")
    return [data[offs[i] : offs[i + 1]] for i in range(count)], offs[-1]


def _parse_dict(raw: bytes) -> dict[int, list[float]]:
    """Top/Private DICT: {op: operands}; op 12 xx stored as 0xC00|xx."""
    out: dict[int, list[float]] = {}
    ops: list[float] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b <= 21:
            if b == 12:
                i += 1
                b = 0xC00 | raw[i]
            out[b] = ops
            ops = []
            i += 1
        elif b == 28:
            ops.append(int.from_bytes(raw[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b == 29:
            ops.append(int.from_bytes(raw[i + 1 : i + 5], "big", signed=True))
            i += 5
        elif b == 30:  # packed-BCD real
            i += 1
            s = ""
            while i < n:
                for nib in (raw[i] >> 4, raw[i] & 15):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 10:
                        s += "."
                    elif nib == 11:
                        s += "E"
                    elif nib == 12:
                        s += "E-"
                    elif nib == 14:
                        s += "-"
                    elif nib == 15:
                        break
                else:
                    i += 1
                    continue
                break
            i += 1
            try:
                ops.append(float(s or "0"))
            except ValueError:
                ops.append(0.0)
        elif 32 <= b <= 246:
            ops.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            ops.append((b - 247) * 256 + raw[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            ops.append(-(b - 251) * 256 - raw[i + 1] - 108)
            i += 2
        else:
            i += 1  # reserved byte: skip (pdf.js errors; be lenient)
    return out


class _Strings:
    """SID resolution with pdf.js's exact bounds quirk: sid-391 ==
    len(strings) reads JS undefined (-> empty name, dropped), anything
    further falls back to '.notdef' (CFFStrings.get)."""

    def __init__(self, items: list[bytes]):
        self.items = items

    def get(self, sid: int) -> str:
        if 0 <= sid < _NUM_STD:
            return _d.CFFStandardStrings[sid]
        k = sid - _NUM_STD
        if k <= len(self.items):
            if k == len(self.items):
                return ""
            return self.items[k].decode("latin-1")
        return _d.CFFStandardStrings[0]


def _parse_charset(
    data: bytes, pos: int, nglyphs: int, strings: _Strings
) -> list[str]:
    """glyphId -> glyph name (pdf.js parseCharsets, cid=False)."""
    if pos == 0:
        return list(_d.ISOAdobeCharset)
    if pos == 1:
        return list(_d.ExpertCharset)
    if pos == 2:
        return list(_d.ExpertSubsetCharset)
    fmt = data[pos]
    pos += 1
    charset = [".notdef"]
    length = nglyphs - 1
    if fmt == 0:
        for _ in range(length):
            sid = (data[pos] << 8) | data[pos + 1]
            pos += 2
            charset.append(strings.get(sid))
    elif fmt in (1, 2):
        nleft_w = 1 if fmt == 1 else 2
        while len(charset) <= length:
            sid = (data[pos] << 8) | data[pos + 1]
            pos += 2
            count = int.from_bytes(data[pos : pos + nleft_w], "big")
            pos += nleft_w
            for _ in range(count + 1):
                charset.append(strings.get(sid))
                sid += 1
    else:
        raise CFFError("unknown charset format")
    return charset


def _parse_encoding(
    data: bytes, pos: int, strings: _Strings, charset: list[str]
) -> dict[int, int]:
    """charcode -> glyphId (pdf.js parseEncoding)."""
    enc: dict[int, int] = {}
    if pos in (0, 1):
        base = _d.ExpertEncoding if pos else StandardEncoding
        for gid, name in enumerate(charset):
            try:
                code = base.index(name)
            except ValueError:
                continue
            enc[code] = gid
        return enc
    fmt = data[pos]
    pos += 1
    low = fmt & 0x7F
    if low == 0:
        count = data[pos]
        pos += 1
        for gid in range(1, count + 1):
            enc[data[pos]] = gid
            pos += 1
    elif low == 1:
        nranges = data[pos]
        pos += 1
        gid = 1
        for _ in range(nranges):
            first, nleft = data[pos], data[pos + 1]
            pos += 2
            for code in range(first, first + nleft + 1):
                enc[code] = gid
                gid += 1
    else:
        raise CFFError("unknown encoding format")
    if fmt & 0x80:  # supplements
        nsup = data[pos]
        pos += 1
        for _ in range(nsup):
            code = data[pos]
            sid = (data[pos + 1] << 8) | data[pos + 2]
            pos += 3
            try:
                enc[code] = charset.index(strings.get(sid))
            except ValueError:
                enc[code] = -1  # indexOf miss -> -1, dropped by caller
    return enc


def cff_builtin_encoding(data: bytes) -> dict[int, str] | None:
    """charcode -> glyph name from the CFF's own Encoding + charset —
    pdf.js CFFFont._createBuiltInEncoding. None for CID-keyed CFFs
    (pdf.js parses `encoding = null` when the Top DICT has /ROS) and
    for fonts whose tables don't yield a single mapping."""
    if len(data) < 4 or data[0] != 1:
        return None
    hdr_size = data[2]
    _, pos = _index(data, hdr_size)  # Name INDEX
    top_dicts, pos = _index(data, pos)  # Top DICT INDEX
    str_items, pos = _index(data, pos)  # String INDEX
    if not top_dicts:
        return None
    top = _parse_dict(top_dicts[0])
    if 0xC1E in top:  # ROS -> CID-keyed: no encoding
        return None
    cs_off = top.get(17)  # CharStrings
    if not cs_off:
        return None
    charstrings, _ = _index(data, int(cs_off[0]))
    nglyphs = len(charstrings)
    strings = _Strings(str_items)
    charset_pos = int(top.get(15, [0])[0])
    enc_pos = int(top.get(16, [0])[0])
    charset = _parse_charset(data, charset_pos, nglyphs, strings)
    encoding = _parse_encoding(data, enc_pos, strings, charset)
    out: dict[int, str] = {}
    for code, gid in encoding.items():
        if gid >= 0 and 0 <= gid < len(charset) and charset[gid]:
            out[code] = charset[gid]
    return out or None
