"""Focused pins for the round-6 optimization internals.

Each test pins an optimized code path against its reference twin:
- the vectorized classic-xref decode vs the tolerant per-row loop;
- the zip_with shingle construction vs the index-loop formulation;
- the inherited-viewbox cache vs direct computation.
"""

from __future__ import annotations

import random

import pytest

from pdf_parse_new_spark import fixtures
from pdf_parse_new_spark.kernels import pdfb


def test_xref_numpy_matches_row_loop():
    raw = fixtures.build_big_binary_pdf(300, seed=11)
    fast = pdfb.Document(raw)
    orig = pdfb._xref_rows_np
    pdfb._xref_rows_np = lambda *a: None  # force the tolerant loop
    try:
        slow = pdfb.Document(raw)
    finally:
        pdfb._xref_rows_np = orig
    assert fast.index == slow.index
    assert fast.trailer.keys() == slow.trailer.keys()


def test_xref_numpy_rejects_deviant_rows():
    # 19-byte rows (single-char EOL) deviate from the strict 20-byte
    # layout: the fast path must bail (None) and leave the tolerant loop
    # to parse them — same final index either way.
    raw = bytearray(fixtures.build_big_binary_pdf(120, seed=3))
    txt = bytes(raw)
    start = txt.rindex(b"\nxref\n") + 1
    head, table = txt[:start], txt[start:]
    deviant = table.replace(b" n \n", b" n\n").replace(b" f \n", b" f\n")
    assert deviant != table
    doc = pdfb.Document(head + deviant)  # falls back, still parses
    ref = pdfb.Document(txt)
    assert doc.index == ref.index


def test_xref_numpy_offsets_exact():
    raw = fixtures.build_big_binary_pdf(200, seed=7)
    doc = pdfb.Document(raw)
    # every 'n' offset must sit exactly on its "N 0 obj" header
    for num, entry in doc.index.items():
        if entry[0] != "n":
            continue
        assert raw[entry[1]:entry[1] + 20].startswith(
            b"%d 0 obj" % num
        ), num


def _old_shingles(col, n=3):
    from pyspark.sql import functions as F

    toks = F.split(col, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


@pytest.mark.parametrize("n", [2, 3, 4])
def test_shingles_zipwith_matches_index_loop(spark, n):
    from pyspark.sql import functions as F

    from pdf_parse_new_spark.operators import dedup

    rng = random.Random(13)
    words = "alpha beta gamma delta epsilon zeta".split()
    rows = [("",), ("one",), ("one two",), ("a b c",), ("x x x x",)] + [
        (" ".join(rng.choice(words) for _ in range(rng.randint(1, 40))),)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "text string")
    diff = (
        df.select(
            _old_shingles(F.col("text"), n).alias("a"),
            dedup.shingles(F.col("text"), n).alias("b"),
        )
        .filter("a != b")
        .count()
    )
    assert diff == 0


def test_viewbox_cache_inheritance():
    # page 0 inherits MediaBox from the Pages node; page 1 overrides it
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 "
        b"/MediaBox [0 0 200 300] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 50 60] >>\n"
        b"endobj\n"
        b"trailer\n<< /Root 1 0 R >>\n"
    )
    doc = pdfb.Document(raw)
    pages: list = []
    root = doc.resolve(doc.trailer.get("Root"))
    pdfb._walk_pages(doc, root.get("Pages"), pages, set(), None)
    assert len(pages) == 2
    vb0 = pdfb._page_view_box(doc, pages[0][0])
    assert vb0 == [0.0, 0.0, 200.0, 300.0]
    # cached second lookup returns the same inherited box
    assert pdfb._page_view_box(doc, pages[0][0]) == vb0
    # a page with its OWN MediaBox must not hit the parent cache
    assert pdfb._page_view_box(doc, pages[1][0]) == [0.0, 0.0, 50.0, 60.0]


def test_simhash_buckets_matches_column_expression(spark):
    from pyspark.sql import functions as F

    from pdf_parse_new_spark.operators import dedup

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sh = dedup.simhash(F.col("text"))
    old = d.select(
        F.col("doc_id"), sh.alias("simhash"),
        F.shiftrightunsigned(sh, 48).alias("bucket"),
    )
    new = dedup.simhash_buckets(d)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def _build_xref_stream_pdf(n_pages: int) -> bytes:
    """Binary doc whose xref lives in a /Type /XRef stream (W [1 4 2]),
    with enough rows to engage the vectorized decode path."""
    import zlib as z

    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
    }
    kid_refs = []
    nxt = 3
    for p in range(n_pages):
        ops = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (pg %d) Tj ET" % p
        bodies[nxt] = (
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
        )
        bodies[nxt + 1] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % nxt
        )
        kid_refs.append(b"%d 0 R" % (nxt + 1))
        nxt += 2
    bodies[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(kid_refs), n_pages,
    )
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    xref_num = nxt
    xref_off = len(out)
    rows = [bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")]
    for num in range(1, xref_num):
        rows.append(bytes([1]) + offsets[num].to_bytes(4, "big") + b"\x00\x00")
    rows.append(bytes([1]) + xref_off.to_bytes(4, "big") + b"\x00\x00")
    comp = z.compress(b"".join(rows))
    out += (
        b"%d 0 obj\n<< /Type /XRef /W [1 4 2] /Size %d /Root 1 0 R "
        b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (xref_num, xref_num + 1, len(comp), comp)
    )
    out += b"startxref\n%d\n%%%%EOF" % xref_off
    return bytes(out)


def test_xref_stream_numpy_matches_row_loop():
    # the index decoded by the vectorized path must equal the reference
    # per-row int.from_bytes loop computed independently here, and the
    # document must parse end-to-end through it
    raw = _build_xref_stream_pdf(64)  # 130 objects >= the 64-row gate
    fast = pdfb.Document(raw)
    assert len(fast.index) >= 128

    import zlib as z

    start = raw.rindex(b"stream\n", 0, raw.rindex(b"endstream")) + 7
    data = z.decompress(raw[start:raw.rindex(b"\nendstream")])
    expect = {}
    for k in range(len(data) // 7):
        typ = data[7 * k]
        f2 = int.from_bytes(data[7 * k + 1:7 * k + 5], "big")
        if typ == 1:
            expect[k] = ("n", f2)  # free entries drop from Document.index
    assert fast.index == expect
    r = pdfb.parse_pdf_bytes(raw)
    assert r["n_pages"] == 64 and "pg 63" in r["text"]
