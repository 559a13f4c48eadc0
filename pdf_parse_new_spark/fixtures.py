"""Deterministic synthetic transcript corpus (seed=42, no external data).

Plays the role of the reference's versioned test corpus
(``/root/reference/test/data/01..05-*.pdf`` + golden ``.txt`` files): each
``(conv_id, turn_idx)`` payload is a pure function of ``(seed, conv_id,
turn_idx)``, so the corpus can be materialized identically on the driver (for
pytest goldens via ``oracle.py``) or distributively inside ``mapInPandas``
(for benchmarks at scale) — no data ever ships from the driver.

Payload family mix mirrors FIXTURES.md §2: pdfstream 35%, pdfstream-multiline
15%, html 25%, plain 15%, corrupt 10%.
"""

from __future__ import annotations

import base64
import random
import zlib

from pdf_parse_new_spark import spec

SEED = 42
# bump when payload generation OR materialized layout changes — cached bench
# corpora key on this (v10: make_transcripts_df_dist round-robin balances
# rows across output partitions so materialized files are even-sized; the
# skewed conversations previously concentrated in a few parquet files, and
# scan splits inherited a 4.5x row imbalance that became the extraction
# stage's straggler tail. Row CONTENT is unchanged — turn payloads are pure
# functions of (seed, conv_id, turn_idx).)
FIXTURES_VERSION = 10

# word bank; includes ligature-bearing words (reference test corpus
# 01-valid.pdf is ligature-heavy, test/01-valid-default.js:8-10)
_WORDS = (
    "transcript spark extraction pipeline shuffle partition conversation "
    "turn payload tokenizer stream decode content operator matrix kernel "
    "window ordered concat golden oracle vectorized arrow batch salted "
    "efﬁcient ﬂuent ofﬁce afﬃliate waﬄe diﬀer "
    "checkpoint lineage manifest snapshot resume idempotent skew broadcast"
).split()

_SENT_LEN = (4, 9)  # words per line


def _rng(conv_id: str, turn_idx: int, salt: str = "") -> random.Random:
    return random.Random(f"{SEED}:{conv_id}:{turn_idx}:{salt}")


def _line(rng: random.Random) -> str:
    n = rng.randint(*_SENT_LEN)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


# ---------------------------------------------------------------- mini-PDF --

def _content_stream(rng: random.Random, n_lines: int) -> tuple[str, str]:
    """Build one page's content stream + its expected extracted text.

    Uses the full operator set (Td/TD/Tm/T*/Tj/TJ/'/\") with a descending Y
    ladder; occasionally emits two same-Y items (must concatenate with no
    space — reference lib/pdf-parse.js:37) and sub-tolerance Y jitter (must
    NOT break the line — Y_TOLERANCE, lib/pdf-parse.js:20,30).
    """
    ops: list[str] = ["BT", "/F1 12 Tf", "1 0 0 1 72 720 Tm", "14 TL"]
    y = 720.0
    expected_lines: list[str] = []
    leading = 14.0
    for i in range(n_lines):
        if i > 0:
            mode = rng.randint(0, 3)
            if mode == 0:
                ops.append(f"0 {-leading:g} Td")
                y -= leading
            elif mode == 1:
                ops.append(f"0 {-leading:g} TD")  # TD also sets leading
                y -= leading
            elif mode == 2:
                y -= leading
                ops.append(f"1 0 0 1 72 {y:g} Tm")
            else:
                ops.append("T*")
                y -= leading
        kind = rng.randint(0, 4)
        if kind == 0:  # plain Tj; sometimes a large-font "title" line;
            # string framed as hex <48...>, octal-escaped, or continued
            # across an escaped EOL (reference Lexer: getHexString +
            # escape handling, pdf.worker.js:13878,13943)
            s = _line(rng)
            enc = rng.random()
            if enc < 0.15 and s.isascii():
                tok = "<" + s.encode("ascii").hex().upper() + ">"
            elif enc < 0.30 and s.isascii():
                i2 = rng.randrange(len(s))
                tok = (
                    "(" + _esc(s[:i2]) + f"\\{ord(s[i2]):03o}"
                    + _esc(s[i2 + 1 :]) + ")"
                )
            elif enc < 0.40 and len(s) > 1 and s.isascii():
                i2 = rng.randrange(1, len(s))
                tok = "(" + _esc(s[:i2]) + "\\\n" + _esc(s[i2:]) + ")"
            else:
                tok = f"({_esc(s)})"
            if rng.random() < 0.25:
                ops.append("/F1 18 Tf")
                ops.append(f"{tok} Tj")
                ops.append("/F1 12 Tf")
            else:
                ops.append(f"{tok} Tj")
            expected_lines.append(s)
        elif kind == 1:  # TJ with kerning numbers
            words = [rng.choice(_WORDS) for _ in range(rng.randint(3, 6))]
            parts, text = [], ""
            for j, w in enumerate(words):
                if j:
                    kern = rng.choice([-250.0, -300.0, -120.0, -50.0])
                    parts.append(f"{kern:g}")
                    if kern < -spec.TJ_SPACE_THRESHOLD:
                        text += " "
                parts.append(f"({_esc(w)})")
                text += w
            ops.append(f"[{' '.join(parts)}] TJ")
            expected_lines.append(text)
        elif kind == 2:  # split run, same Y -> no space between halves
            s1, s2 = rng.choice(_WORDS), rng.choice(_WORDS)
            ops.append(f"({_esc(s1)}) Tj")
            jitter = rng.choice([0.0, 0.4, -0.7])  # sub-tolerance
            if jitter:
                ops.append(f"8 {jitter:g} Td")
            ops.append(f"({_esc(s2)}) Tj")
            expected_lines.append(s1 + s2)
        elif kind == 3:  # ' next-line-show (merges into previous line? no:
            # ' moves y by leading first -> it IS its own line)
            s = _line(rng)
            ops.append(f"({_esc(s)}) '")
            y -= leading
            expected_lines.append(s)
        else:  # " with word/char spacing operands
            s = _line(rng)
            ops.append(f"0.5 0.1 ({_esc(s)}) \"")
            y -= leading
            expected_lines.append(s)
    ops.append("ET")
    return "\n".join(ops), "\n".join(expected_lines)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf_incremental(rng: random.Random, n_pages: int) -> str:
    """Incrementally-updated document: a base classic doc plus an appended
    update section (new page + content objects, a second xref subsection
    covering only them, and a trailer whose /Prev points at the base xref —
    the PDF incremental-save layout; reference XRef.parse follows Prev
    chains, pdf.worker.js:58108-58117)."""
    base_pages = max(1, n_pages - 1)
    base = build_pdf(rng, base_pages)
    base_xref_off = int(base.rsplit("startxref\n", 1)[1].split("\n")[0])
    next_obj = 2 * base_pages + 1
    page_no, content_no = next_obj, next_obj + 1
    stream, _ = _content_stream(rng, rng.randint(2, 6))
    payload = base64.b64encode(zlib.compress(stream.encode("utf-8"))).decode("ascii")
    out = [base, "\n"]
    pos = len(base) + 1
    offs = {}
    for num, body in (
        (page_no, f"<< /Type /Page /Contents {content_no} 0 R >>"),
        (
            content_no,
            f"<< /Length {len(payload)} /Filter /FlateDecode >>\n"
            f"stream\n{payload}\nendstream",
        ),
    ):
        chunk = f"{num} 0 obj\n{body}\nendobj\n"
        offs[num] = pos
        out.append(chunk)
        pos += len(chunk)
    xref2 = pos
    out.append(
        f"xref\n{page_no} 2\n"
        f"{offs[page_no]:010d} 00000 n \n{offs[content_no]:010d} 00000 n \n"
        f"trailer\n<< /Size {content_no + 1} /Root 1 0 R /Prev {base_xref_off} >>\n"
        f"startxref\n{xref2}\n%%EOF"
    )
    return "".join(out)


def build_pdf(rng: random.Random, n_pages: int, break_xref: bool = False,
              xref_stream: bool = False, obj_stream: bool = False) -> str:
    """Serialize a deterministic ASCII mini-PDF (spec.py format).

    ``break_xref=True`` zeroes the xref offsets: still a *valid* document —
    the parser must fall back to the brute-force object recovery scan
    (reference ``indexObjects``, pdf.worker.js:58331-58476).

    ``xref_stream=True`` replaces the classic table with a PDF-1.5-style
    cross-reference *stream* object: ``/Type /XRef /W [1 4 2]`` dict whose
    (zlib+base64-framed) body holds packed binary rows ``type:1 offset:4
    gen:2`` (reference ``readXRefStream``, pdf.worker.js:58264-58330).

    ``obj_stream=True`` (implies ``xref_stream``) additionally packs the
    page dict objects into a ``/Type /ObjStm`` compressed object stream;
    their xref rows become type-2 ``(objstm, index)`` entries (reference
    compressed object streams, pdf.js XRef fetchCompressed)."""
    objects: list[tuple[int, str]] = []
    page_nums: list[int] = []
    next_obj = 1
    for _ in range(n_pages):
        page_no, content_no = next_obj, next_obj + 1
        next_obj += 2
        stream, _ = _content_stream(rng, rng.randint(2, 6))
        payload = base64.b64encode(zlib.compress(stream.encode("utf-8"))).decode("ascii")
        page_nums.append(page_no)
        objects.append((page_no, f"<< /Type /Page /Contents {content_no} 0 R >>"))
        objects.append((
            content_no,
            f"<< /Length {len(payload)} /Filter /FlateDecode >>\n"
            f"stream\n{payload}\nendstream",
        ))
    # ~40% of docs carry a trailer /Info dict (P2: reference Result.info,
    # lib/pdf-parse.js:91-96); drawn AFTER all page content so
    # expected_pdf_text's replay stays aligned
    info_no = None
    if rng.random() < 0.4:
        title = " ".join(rng.choice(_WORDS) for _ in range(3))
        author = rng.choice(_WORDS).title()
        info_no = next_obj
        next_obj += 1
        objects.append((
            info_no,
            f"<< /Title ({_esc(title)}) /Author ({_esc(author)}) "
            f"/Producer (pdf-parse-new-spark) >>",
        ))
    if obj_stream:
        xref_stream = True
        packed_pages = [(n, b) for n, b in objects if n in set(page_nums)]
        objects = [(n, b) for n, b in objects if n not in set(page_nums)]
        bodies = "".join(b for _, b in packed_pages)
        offs, acc = [], 0
        for _, b in packed_pages:
            offs.append(acc)
            acc += len(b)
        header = (
            " ".join(f"{n} {o}" for (n, _), o in zip(packed_pages, offs)) + "\n"
        )
        stm = header + bodies
        payload = base64.b64encode(zlib.compress(stm.encode("utf-8"))).decode("ascii")
        objstm_no = next_obj
        next_obj += 1
        objects.append((
            objstm_no,
            f"<< /Type /ObjStm /N {len(packed_pages)} /First {len(header)} "
            f"/Length {len(payload)} /Filter /FlateDecode >>\n"
            f"stream\n{payload}\nendstream",
        ))
    out, offsets = ["%PDF-1.4\n"], {}
    pos = len(out[0])
    for num, body in objects:
        chunk = f"{num} 0 obj\n{body}\nendobj\n"
        offsets[num] = pos
        out.append(chunk)
        pos += len(chunk)
    xref_off = pos
    size = next_obj
    if xref_stream:
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for num in range(1, size):
            if obj_stream and num in set(page_nums):
                idx = page_nums.index(num)
                rows += bytes([2]) + (size - 1).to_bytes(4, "big") + idx.to_bytes(2, "big")
            else:
                rows += bytes([1]) + offsets[num].to_bytes(4, "big") + b"\x00\x00"
        payload = base64.b64encode(zlib.compress(bytes(rows))).decode("ascii")
        out.append(
            f"{size} 0 obj\n"
            f"<< /Type /XRef /W [1 4 2] /Size {size} /Length {len(payload)} "
            f"/Filter /FlateDecode /Root 1 0 R"
            + (f" /Info {info_no} 0 R" if info_no else "")
            + " >>\n"
            f"stream\n{payload}\nendstream\nendobj\n"
        )
        out.append(f"startxref\n{xref_off}\n%%EOF")
        return "".join(out)
    xref = ["xref\n", f"0 {size}\n", "0000000000 65535 f \n"]
    for num in range(1, size):
        off = 0 if break_xref else offsets[num]
        xref.append(f"{off:010d} 00000 n \n")
    out.extend(xref)
    info_part = f" /Info {info_no} 0 R" if info_no else ""
    out.append(
        f"trailer\n<< /Size {size} /Root 1 0 R{info_part} >>\n"
        f"startxref\n{xref_off}\n%%EOF"
    )
    return "".join(out)


def expected_pdf_text(rng_key: tuple[str, int, str], n_pages: int) -> str:
    """Recompute a payload's expected text by replaying the same RNG draws.

    Only used by tests to sanity-check the oracle; the oracle itself parses.
    """
    rng = _rng(*rng_key[:2], rng_key[2])
    pages = []
    for _ in range(n_pages):
        stream, expected = _content_stream(rng, rng.randint(2, 6))
        base64.b64encode(zlib.compress(stream.encode("utf-8")))  # keep draws aligned
        pages.append(expected)
    return spec.PAGE_SEP.join(pages)


# ------------------------------------------------------------------- HTML --

def build_html(rng: random.Random) -> str:
    """HTML with a main-content block plus boilerplate (nav/sidebar/footer
    link farms) — north-rule axis B test material."""
    nav_links = " ".join(
        f'<a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a>' for _ in range(6)
    )
    side = "".join(f"<li><a href='#'>{rng.choice(_WORDS)}</a></li>" for _ in range(5))
    paras = []
    for _ in range(rng.randint(2, 5)):
        n = rng.randint(6, 14)
        body = " ".join(rng.choice(_WORDS) for _ in range(n))
        if rng.random() < 0.4:  # inline markup + entity inside main content
            body += " <b>bold &amp; strong</b>"
        paras.append(f"<p>{body}</p>")
    short = f"<p>{rng.choice(_WORDS)}</p>"  # below min-length -> dropped
    linky = (
        "<p>read <a href='#'>more more more more more more</a> "
        f"<a href='#'>{rng.choice(_WORDS)}</a> ok</p>"
    )  # link-ratio too high -> dropped
    # main-content leaf div (kept: long text, no links, low tag density)
    main_div = (
        f"<div class='main'>{' '.join(rng.choice(_WORDS) for _ in range(rng.randint(8, 16)))}</div>"
    )
    # widget div: tag-dense (one tag per word) -> dropped by tag density
    widget = (
        "<div class='widget'>"
        + "".join(f"<span>{rng.choice(_WORDS)}</span> " for _ in range(8))
        + "</div>"
    )
    # article container with nested paragraphs (leaf blocks win, the
    # container recurses) + numeric character references in the content
    quoted = (
        f"{rng.choice(_WORDS)}&#8217;s {rng.choice(_WORDS)} "
        f"&#x2019;{rng.choice(_WORDS)}"
    )
    article = (
        "<article><p>"
        + " ".join(rng.choice(_WORDS) for _ in range(rng.randint(7, 12)))
        + f"</p><p>{quoted} "
        + " ".join(rng.choice(_WORDS) for _ in range(6))
        + "</p></article>"
    )
    # long standalone list item: a kept candidate block (unlike the sidebar
    # link-farm li's, dropped by length/link-ratio)
    li_item = (
        "<li>" + " ".join(rng.choice(_WORDS) for _ in range(rng.randint(7, 12)))
        + "</li>"
    )
    return (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>p{color:red}</style></head><body>"
        f"<nav>{nav_links}</nav><ul class='sidebar'>{side}</ul>"
        f"{widget}{short}{''.join(paras)}{article}{li_item}{main_div}{linky}"
        f"<footer>{nav_links}</footer></body></html>"
    )


# ------------------------------------------------------------------ plain --

def build_plain(rng: random.Random) -> str:
    lines = [_line(rng) for _ in range(rng.randint(1, 5))]
    sep = "\r\n" if rng.random() < 0.4 else "\n"
    return sep.join(lines)


# ---------------------------------------------------------------- corrupt --

def build_corrupt(rng: random.Random) -> str:
    kind = rng.randint(0, 4)
    if kind == 0:  # bad zlib cmf header inside an otherwise valid frame
        good = build_pdf(rng, 1)
        i = good.index("stream\n") + len("stream\n")
        j = good.index("\nendstream")
        bad = base64.b64encode(b"\x00\x01" + b"junk" * 5).decode("ascii")
        return good[:i] + bad + good[j:]
    if kind == 1:  # truncated flate body
        good = build_pdf(rng, 1)
        i = good.index("stream\n") + len("stream\n")
        j = good.index("\nendstream")
        return good[:i] + good[i : i + max(4, (j - i) // 3)] + good[j:]
    if kind == 2:  # missing xref/trailer/startxref (truncated tail)
        good = build_pdf(rng, 1)
        return good[: good.index("xref")].replace(" obj", " ob")  # also maim
        # the object markers so the recovery scan cannot resurrect it
    if kind == 3:  # bad base64 in stream body
        good = build_pdf(rng, 1)
        i = good.index("stream\n") + len("stream\n")
        return good[:i] + "@@not-base64@@" + good[good.index("\nendstream"):]
    # binary garbage with NUL bytes
    return "%\x00" + "".join(chr(rng.randint(1, 255)) for _ in range(64))


# ------------------------------------------------------------- assembly ----

FAMILIES = ("pdfstream", "pdfstream-multiline", "html", "plain", "corrupt")
_WEIGHTS = (35, 15, 25, 15, 10)


def family_for(conv_id: str, turn_idx: int) -> str:
    return _rng(conv_id, turn_idx, "family").choices(FAMILIES, weights=_WEIGHTS)[0]


def payload_for(conv_id: str, turn_idx: int) -> tuple[str, str]:
    """(family, raw payload) — pure function of (SEED, conv_id, turn_idx)."""
    fam = family_for(conv_id, turn_idx)
    rng = _rng(conv_id, turn_idx, "payload")
    if fam == "pdfstream":
        # 15% of single-page docs carry a zeroed xref table (valid document,
        # must succeed via the recovery scan — SURVEY §2.1 S6); another 15%
        # use a PDF-1.5-style xref *stream* (S5)
        r = rng.random()
        return fam, build_pdf(
            rng, 1, break_xref=r < 0.15, xref_stream=0.15 <= r < 0.30
        )
    if fam == "pdfstream-multiline":
        r = rng.random()
        n = rng.randint(2, 4)
        # 30% xref-stream docs (S5), 15% compressed object streams,
        # 15% incrementally-updated docs with /Prev chains
        if 0.45 <= r < 0.60:
            return fam, build_pdf_incremental(rng, n)
        return fam, build_pdf(
            rng, n, xref_stream=r < 0.30, obj_stream=0.30 <= r < 0.45
        )
    if fam == "html":
        return fam, build_html(rng)
    if fam == "plain":
        return fam, build_plain(rng)
    return fam, build_corrupt(rng)


ROLES = ("user", "assistant", "tool")
_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z


def turn_row(conv_id: str, conv_no: int, turn_idx: int) -> tuple:
    fam, payload = payload_for(conv_id, turn_idx)
    role = ROLES[turn_idx % 3]
    tool = f"tool_{turn_idx % 4}" if role == "tool" else ""
    ts = _BASE_TS + conv_no * 3600 + turn_idx * 7
    return (conv_id, turn_idx, role, payload, tool, ts)


def conv_sizes(n_convs: int, median_turns: int, skew_convs: int = 0,
               skew_turns: int = 0) -> list[tuple[str, int]]:
    """Deterministic (conv_id, n_turns) list with an explicit skew tail —
    a few conversations get ~skew_turns turns to exercise salted
    repartitioning (north rule; reference chunk analog
    lib/pdf-parse-processes.js:92-99)."""
    out = []
    for i in range(n_convs):
        rng = random.Random(f"{SEED}:conv:{i}")
        n = max(1, int(rng.gauss(median_turns, median_turns / 3)))
        if i < skew_convs:
            n = skew_turns
        out.append((f"conv-{i:06d}", n))
    return out


def transcript_rows(n_convs: int, median_turns: int, skew_convs: int = 0,
                    skew_turns: int = 0):
    for conv_no, (cid, n) in enumerate(
        conv_sizes(n_convs, median_turns, skew_convs, skew_turns)
    ):
        for t in range(n):
            yield turn_row(cid, conv_no, t)


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def make_transcripts_df(spark, n_convs=20, median_turns=8, skew_convs=0,
                        skew_turns=0):
    """Driver-side materialization (small scales: pytest)."""
    import datetime

    rows = [
        (c, t, r, x, tl, datetime.datetime.utcfromtimestamp(ts))
        for (c, t, r, x, tl, ts) in transcript_rows(
            n_convs, median_turns, skew_convs, skew_turns
        )
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def make_transcripts_df_dist(spark, n_convs=5000, median_turns=40,
                             skew_convs=0, skew_turns=0, partitions=64):
    """Distributed materialization: only (conv_id, conv_no, n_turns) tuples
    leave the driver; payloads are generated inside mapInPandas on executors
    from the same pure functions — deterministic at any parallelism.

    The generated rows are round-robin rebalanced across ``partitions`` so a
    materialized corpus lands in even-sized files: the skew conversations
    (skew_turns >> median_turns) would otherwise pile into whichever
    partitions their conv_id hashes to, and every later scan of the parquet
    would inherit that imbalance as a straggler tail (guide: fix input skew
    at the source). The rebalance runs once at generation time, never inside
    a timed query."""
    import pandas as pd

    sizes = conv_sizes(n_convs, median_turns, skew_convs, skew_turns)
    seed_df = spark.createDataFrame(
        [(cid, i, n) for i, (cid, n) in enumerate(sizes)],
        "conv_id string, conv_no int, n_turns int",
    ).repartition(partitions, "conv_id")

    def gen(batches):
        for pdf in batches:
            recs = []
            for cid, cno, n in zip(pdf.conv_id, pdf.conv_no, pdf.n_turns):
                for t in range(int(n)):
                    recs.append(turn_row(cid, int(cno), t))
            out = pd.DataFrame(
                recs,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )
            out["ts"] = pd.to_datetime(out["ts"], unit="s")
            yield out

    return seed_df.mapInPandas(gen, TRANSCRIPT_SCHEMA).repartition(partitions)


def build_big_binary_pdf(
    n_pages: int, seed: int = 7, lines: tuple[int, int] = (4, 9)
) -> bytes:
    """A deterministic multi-thousand-page BINARY-dialect PDF (classic xref,
    Flate content streams, shared font) for the intra-document chunking
    operator and its bench — the analog of the reference's huge-doc
    benchmark scenario (9,924 pages in one file, README.md:769).

    Not part of the transcript corpus: FIXTURES_VERSION does not cover it.
    """
    import zlib

    rng = random.Random(seed)
    words = [
        "traces", "chunk", "ordered", "page", "range", "fanout", "salted",
        "broadcast", "kernel", "arrow", "stream", "xref", "catalog",
    ]
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # a shared Type1 font: text rendered WITHOUT a Tf is a spec
        # violation pdf.js refuses to draw (ensureStateFont), so fixtures
        # must select one to stay comparable with the reference
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    res = b" /Resources << /Font << /F1 3 0 R >> >>"
    kid_refs = []
    next_obj = 4
    page_objs = []
    for p in range(n_pages):
        page_lines = []
        yy = 760
        for li in range(rng.randint(*lines)):
            text = " ".join(rng.choice(words) for _ in range(rng.randint(5, 11)))
            page_lines.append(
                b"1 0 0 1 72 %d Tm (%s p%d l%d) Tj"
                % (yy, text.encode(), p + 1, li)
            )
            yy -= 14
        ops = b"BT /F1 10 Tf " + b" ".join(page_lines) + b" ET"
        comp = zlib.compress(ops)
        content_num = next_obj
        page_num = next_obj + 1
        next_obj += 2
        objects[content_num] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(comp), comp)
        )
        objects[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R%s >>"
            % (content_num, res)
        )
        kid_refs.append(b"%d 0 R" % page_num)
        page_objs.append(page_num)
    objects[2] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>"
        % (b" ".join(kid_refs), n_pages)
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_off = len(out)
    size = max(objects) + 1
    out += b"xref\n0 %d\n" % size
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (size, xref_off)
    )
    return bytes(out)
