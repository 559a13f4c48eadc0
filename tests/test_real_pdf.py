"""Parity with the reference's OWN test corpus and assertions.

Each case mirrors a reference mocha test verbatim (page count, numrender,
first/last-page substrings, non-null info — test/01-valid-default.js:16-30
and siblings), run against the real binary PDFs in
/root/reference/test/data. 03-invalid mirrors the rejection test
(test/03-invalid-default.js: the promise must reject) as an error ROW.

Beyond the reference's substring asserts, we hold a word-recall floor vs the
reference-produced golden .txt files (its pdf.js text output) so fidelity
regressions are caught even when the two probe substrings survive.
"""

from __future__ import annotations

import json
import re
from collections import Counter

import pytest

from pdf_parse_new_spark.kernels import pdfb

DATA = "/root/reference/test/data"

CASES = [
    # (name, n_pages, first_page_text, last_page_text, recall_floor)
    (
        "01-valid", 14,
        "Because traces are in SSA form and have no join points",
        "not be interpreted as necessarily representing the official views",
        0.95,
    ),
    (
        "02-valid", 5,
        "According to literature, solar cells",
        "royal Institute of Technology, Stockholm",
        0.95,
    ),
    (
        "04-valid", 5,
        "Exercise is one of the low-cost and easiest ways for improving"
        " life standards",
        "accounts for the biological activity of endothelium-derived",
        0.98,
    ),
    ("05-versions-space", 1, "Dadfrtfjh,mgf", "v.0.01", 1.0),
]


def _words(t: str) -> Counter:
    return Counter(re.findall(r"\w+", t.lower()))


@pytest.mark.parametrize("name,n_pages,first,last,floor", CASES)
def test_reference_corpus_assertions(name, n_pages, first, last, floor):
    raw = open(f"{DATA}/{name}.pdf", "rb").read()
    r = pdfb.parse_pdf_bytes(raw)
    # the reference's own asserts (test/0X-*-default.js)
    assert r["n_pages"] == n_pages
    assert r["n_render"] == n_pages
    assert first in r["text"]
    assert last in r["text"]
    assert r["info"], "info must be non-null (assert.notEqual(data.info, null))"
    # fidelity floor vs the reference-produced golden text
    gold = open(f"{DATA}/{name}.pdf.txt", encoding="utf-8").read()
    gc, oc = _words(gold), _words(r["text"])
    recall = sum((gc & oc).values()) / max(1, sum(gc.values()))
    assert recall >= floor, f"word recall {recall:.3f} < {floor}"


def test_reference_corpus_max_pages():
    # test/01-valid-default.js "option max: N-1": numrender = N-1, first-page
    # text still present, LAST-page text absent
    raw = open(f"{DATA}/01-valid.pdf", "rb").read()
    r = pdfb.parse_pdf_bytes(raw, max_pages=13)
    assert r["n_pages"] == 14 and r["n_render"] == 13
    assert "Because traces are in SSA form and have no join points" in r["text"]
    assert (
        "not be interpreted as necessarily representing the official views"
        not in r["text"]
    )
    # max larger than the doc clamps (lib/pdf-parse.js:98)
    r2 = pdfb.parse_pdf_bytes(raw, max_pages=99)
    assert r2["n_render"] == 14


def test_invalid_pdf_rejects_as_error_row():
    # test/03-invalid-default.js: the reference REJECTS this truncated file;
    # our distributed semantics = an error row, never a task failure
    raw = open(f"{DATA}/03-invalid.pdf", "rb").read()
    r = pdfb.parse_pdf_bytes(raw)
    assert r["error"] is not None
    assert r["text"] == "" and r["n_pages"] == 0


def test_info_dict_fields():
    # lib/pdf-parse.js:91-96 returns the /Info dict; spot-check known fields
    raw = open(f"{DATA}/01-valid.pdf", "rb").read()
    info = pdfb.parse_pdf_bytes(raw)["info"]
    assert info.get("Producer") == "pdfeTeX-1.21a"
    assert info.get("Creator") == "TeX"


def test_spark_binaryfile_pipeline(spark):
    # end-to-end through the binaryFile source + mapInPandas operator
    from pdf_parse_new_spark.operators import extract as ex

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(DATA)
    )
    rows = {
        r.doc_id.rsplit("/", 1)[-1]: r
        for r in ex.extract_pdf_documents(df).collect()
    }
    assert len(rows) == 5
    ok = rows["01-valid.pdf"]
    assert ok.n_pages == 14 and ok.error is None
    assert "Because traces are in SSA form" in ok.text
    assert json.loads(ok.info)["Creator"] == "TeX"
    bad = rows["03-invalid.pdf"]
    assert bad.error is not None and bad.text == ""


def test_object_parser_primitives():
    # hex strings, octal escapes, line continuations, nested parens,
    # name #xx escapes, refs, dict/array nesting (pdf.js Lexer semantics)
    po = pdfb.parse_object
    assert po(b"<48656C6C6F>", 0)[0] == b"Hello"
    # whitespace inside hex strings ignored; odd digit count pads a 0
    assert po(b"<48 65 6c 6C 6f2>", 0)[0] == b"Hello\x20"
    assert po(rb"(a\053b)", 0)[0] == b"a+b"
    assert po(b"(line\\\ncont)", 0)[0] == b"linecont"
    assert po(rb"(nested (parens) ok)", 0)[0] == b"nested (parens) ok"
    assert po(rb"/Name#20With#23Hash", 0)[0] == "Name With#Hash"
    r, _ = po(b"12 0 R", 0)
    assert isinstance(r, pdfb.Ref) and r.num == 12
    d, _ = po(b"<< /A [1 2 (x)] /B << /C 3.5 >> >>", 0)
    assert d["A"] == [1, 2, b"x"] and d["B"]["C"] == 3.5
