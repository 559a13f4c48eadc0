"""Extraction spec — the single source of truth for payload formats and
extraction semantics shared by the fixture generator (``fixtures.py``), the
pure-Python oracle (``oracle.py``) and the vectorized Spark kernels
(``kernels/``).

The semantics mirror the reference engine's observable behavior:

* Line fold: a ``\\n`` is emitted between successive text items whenever
  ``|y_cur - y_last| > Y_TOLERANCE``; equal-line items concatenate with NO
  inserted space (reference ``lib/pdf-parse.js:20-39``).
* Page join: page texts join with ``"\\n\\n"``; *sequential* mode prepends a
  leading ``"\\n\\n"`` (reference ``lib/pdf-parse.js:134``), *parallel* mode
  does not (``lib/pdf-parse.js:126``). Both live behind a flag.
* ``max`` turns: ``<= 0`` means all; clamped to the conversation's turn count
  (``lib/pdf-parse.js:98-99``); ``n_extracted`` reports the clamped counter.
* Per-page failure masks to ``""`` and never aborts the document
  (``lib/pdf-parse.js:116-119,131-133``); a structurally invalid document
  yields an error row, never a job failure (``test/03-invalid-default.js``).
* NFKC normalization folds ligatures (reference bundled pdf.js
  ``normalizeUnicode``, pdf.worker.js:5303-5309).

Payload families (detected from the raw ``text`` column):

``pdfstream``  starts with ``%PDF-``. A deterministic ASCII-framed mini-PDF:
    header line, numbered objects (``N 0 obj ... endobj``), page objects
    (``<< /Type /Page /Contents M 0 R >>``), content objects whose
    ``stream\\n<base64(zlib(content))>\\nendstream`` body holds a PDF-style
    content stream, a classic fixed-width ``xref`` table, a ``trailer`` dict,
    ``startxref`` offset, ``%%EOF``.
    Content-stream operators supported: BT ET Td TD Tm T* Tf Tj TJ ' "
    (reference pdf.worker.js:36856-36945). TJ arrays mix strings and kerning
    numbers; a number ``< -TJ_SPACE_THRESHOLD`` contributes one space.
``html``       starts with ``<!DOCTYPE`` or ``<html``. Main content =
    ``<p>…</p>`` blocks that pass the boilerplate filter (min text length +
    link-ratio), tags stripped, entities unescaped, whitespace collapsed.
``plain``      anything else printable: CRLF->LF + NFKC identity transform.
``corrupt``    detected during parse (bad header/xref/b64/zlib/cmf) or via a
    NUL byte (binary garbage) -> error row with ``extracted_text == ""``.
"""

from __future__ import annotations

# --- line-fold kernel (reference lib/pdf-parse.js:20) ---
Y_TOLERANCE = 1.0

# --- TJ kerning-number -> implied space threshold (our spec; reference
# pdf.worker.js:36889-36894 scales by -fontSize/1000 — we fix the cut) ---
TJ_SPACE_THRESHOLD = 180.0

# --- page/turn join separator (reference lib/pdf-parse.js:126,134) ---
PAGE_SEP = "\n\n"

# --- UAX#9-lite bidi (reference runBidiTransform, pdf.worker.js:36495) ---
# PDF show-text items store RTL scripts in logical order; extraction output
# is visual order. The lite rule (oracle and kernels implement it
# INDEPENDENTLY and must agree byte-for-byte):
#   1. a maximal segment R(N+R)* \u2014 RTL runs plus any NEUTRAL characters
#      strictly BETWEEN two RTL runs \u2014 reverses as ONE visual segment
#      (UAX#9 rule N1: neutrals between equal strong types take that type);
#   2. paired brackets inside a reversed segment MIRROR (rule L4);
#   3. neutrals at a segment edge (between L and R) keep their position
#      with the LTR side (rule N2 under an LTR base direction).
# Still out of scope, documented: explicit embeddings/overrides
# (LRE/RLE/PDF/LRI...), the BD16 bracket-PAIR algorithm, and R2L base
# direction \u2014 the reference's full runBidiTransform handles those.
RTL_RANGES = (
    ("\u0590", "\u08ff"),  # Hebrew, Arabic, Syriac, Thaana, ...
    ("\ufb1d", "\ufdff"),  # presentation forms A
    ("\ufe70", "\ufeff"),  # presentation forms B
)
RTL_CLASS = "".join(f"{a}-{b}" for a, b in RTL_RANGES)
# neutrals: whitespace + ASCII punctuation + guillemets + general dash/quote
# block (as a regex character-class body)
BIDI_NEUTRAL_CLASS = r" \t!-/:-@\[-`{-~\u00ab\u00bb\u2010-\u201f"
# paired-bracket mirroring inside reversed segments (UAX#9 L4 subset)
BIDI_MIRROR = str.maketrans("()[]{}<>\u00ab\u00bb\u2039\u203a", ")(][}{><\u00bb\u00ab\u203a\u2039")

# --- HTML boilerplate-strip thresholds (north-rule axis B) ---
# Candidate blocks are non-overlapping <p> or <div> elements scanned
# left-to-right (the generator guarantees divs contain no nested block
# elements). A block is main content iff ALL of:
#   len(visible text) >= HTML_MIN_TEXT_LEN
#   link_text_len <= HTML_MAX_LINK_RATIO * len(visible text)
#   count('<' in inner html) <= HTML_MAX_TAG_DENSITY * word count
HTML_MIN_TEXT_LEN = 25      # kept blocks need >= this many visible chars
HTML_MAX_LINK_RATIO = 0.33  # at most this fraction of link text
HTML_MAX_TAG_DENSITY = 0.25  # at most this many tags per visible word

# --- error codes (per-turn error rows; never job failures) ---
ERR_BINARY = "binary-garbage"
ERR_NO_STARTXREF = "pdf:no-startxref"
ERR_BAD_XREF = "pdf:bad-xref"
ERR_NO_PAGES = "pdf:no-pages"
ERR_BAD_B64 = "pdf:bad-b64"
ERR_BAD_CMF = "pdf:bad-cmf"
ERR_FLATE = "pdf:flate"
ERR_ENCRYPTED = "pdf:encrypted"  # reference: pdf.js PasswordException -> reject

# payload family tags
FAM_PDF = "pdfstream"
FAM_HTML = "html"
FAM_PLAIN = "plain"
FAM_CORRUPT = "corrupt"

# basic HTML entities the generator may emit (both sides unescape exactly these)
HTML_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&nbsp;": " ",
}
