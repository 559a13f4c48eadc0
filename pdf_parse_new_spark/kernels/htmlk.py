"""HTML boilerplate-strip kernel (north-rule axis B).

Strategy: flatten ALL ``<p>…</p>`` blocks of the whole Arrow batch into one
flat frame (row id, span, inner html), clean them with vectorized
``Series.str`` ops (tag strip, entity unescape, whitespace collapse), score
each block by visible-text length and link-text ratio, then group back per
row. The only per-row Python is the ``finditer`` that records span offsets —
everything downstream is whole-batch.

Spec (spec.py): keep a paragraph iff ``len(text) >= HTML_MIN_TEXT_LEN`` and
``link_len <= HTML_MAX_LINK_RATIO * max(1, len(text))``; kept texts join with
"\\n"; NFKC at the end.
"""

from __future__ import annotations

import re

import pandas as pd

from pdf_parse_new_spark import spec

_BLOCK = re.compile(r"<(p|div|article|li|section|main|blockquote)\b[^>]*>(.*?)</\1>", re.S | re.I)
_LINK = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S | re.I)
_TAG_RE = r"<[^>]+>"


def _strip_sub(m: re.Match) -> str:
    tok = m.group(0)
    if tok[0] == "<":
        return " "
    known = spec.HTML_ENTITIES.get(tok)
    if known is not None:
        return known
    if tok[1] == "#":
        cp = int(tok[3:-1], 16) if tok[2] in "xX" else int(tok[2:-1])
        # WHATWG charref rules (html.unescape parity): NUL, out-of-range and
        # surrogate codepoints decode to U+FFFD — a lone surrogate would be
        # un-UTF-8-encodable and fail the Arrow task
        if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return "�"
        return chr(cp)
    return tok  # unknown named entity: keep literal


_TAG_ONLY = re.compile(_TAG_RE)
_ENT_ONLY = re.compile(r"&(?:[a-zA-Z]+|#\d{1,7}|#[xX][0-9A-Fa-f]{1,6});")


_WS_RUN = re.compile(r"\s+")


def _clean_one(s: str) -> str:
    # split the fused sweep: tags first via a PLAIN C-level replace (97%
    # of matches — no per-match Python), then the entity callback over
    # the few "&...;" tokens. Equivalent to the fused pass: a tag
    # becomes a space (never empty), so removals cannot splice new
    # entities together, and entities decode AFTER tag stripping, so a
    # decoded "<" (&lt;) is never re-stripped — the same decode-once
    # ordering the fused alternation had. The "&" gate skips the
    # callable-replacement pass for the (majority) entity-free blocks.
    t = _TAG_ONLY.sub(" ", s)
    if "&" in t:
        t = _ENT_ONLY.sub(_strip_sub, t)
    return _WS_RUN.sub(" ", t).strip()


def _clean(col: pd.Series) -> pd.Series:
    # plain list comprehension over the flat block frame: three pandas
    # .str passes cost an object-loop EACH; one loop with bound C-regex
    # subs measured ~35% cheaper on the html kernel
    return pd.Series(
        [_clean_one(s) for s in col.to_numpy()],
        index=col.index, dtype=object,
    )


def _collect_blocks(raw: str, base: int, out: list, depth: int = 0) -> None:
    """Leaf candidate blocks, recursing into containers (oracle
    _candidate_blocks twin — same depth cap and same-tag-nesting caveat)."""
    for m in _BLOCK.finditer(raw):
        inner = m.group(2)
        tag0 = m.group(1)[0]
        # p/li are always leaves in this dialect; the rest
        # (div/article/section/main/blockquote) may contain nested blocks
        if depth < 4 and (tag0 not in "pPlL") and _BLOCK.search(inner):
            _collect_blocks(inner, base + m.start(2), out, depth + 1)
        else:
            out.append(
                (base + m.start(), base + m.end(), m.group(1).lower(), inner)
            )


def extract(texts: pd.Series) -> pd.DataFrame:
    rows, starts, ends, inners, tags = [], [], [], [], []
    for idx, raw in texts.items():
        blocks: list = []
        _collect_blocks(raw, 0, blocks)
        for s, e, tag, inner in blocks:
            rows.append(idx)
            starts.append(s)
            ends.append(e)
            inners.append(inner)
            tags.append(tag)

    out = pd.DataFrame(
        {
            "family": spec.FAM_HTML,
            "extracted_text": "",
            "spans": [[] for _ in range(len(texts))],
            "error": None,
            "n_pages": 1,
            "info": None,
        },
        index=texts.index,
    )
    if not rows:
        return out

    flat = pd.DataFrame(
        {"row": rows, "start": starts, "end": ends, "inner": inners, "tag": tags}
    )
    flat["text"] = _clean(flat["inner"])

    def _link_len(s: str) -> int:
        # "<a" gate: most blocks carry no anchors at all — findall over
        # every block was ~15% of the kernel
        if "<a" not in s and "<A" not in s:
            return 0
        joined = "".join(_LINK.findall(s))
        return len(_TAG_ONLY.sub("", joined).strip())

    flat["link_len"] = [_link_len(s) for s in flat["inner"].to_numpy()]
    tlen = flat["text"].str.len()
    # len(s.split(" ")) == s.count(" ") + 1 exactly (split on EVERY
    # occurrence counts empty fields), without materializing the lists;
    # the +1 also makes the old clip(lower=1) a no-op
    n_words = flat["text"].str.count(" ") + 1
    tag_count = flat["inner"].str.count("<")
    keep = (
        (tlen >= spec.HTML_MIN_TEXT_LEN)
        & (flat["link_len"] <= spec.HTML_MAX_LINK_RATIO * tlen.clip(lower=1))
        & (tag_count <= spec.HTML_MAX_TAG_DENSITY * n_words)
    )
    kept = flat[keep]
    if len(kept):
        # one cheap pass over the (few) kept paragraphs; flat is built in row
        # order so append order == document order
        texts_by_row: dict = {}
        spans_by_row: dict = {}
        for row, s, e, txt, tag in zip(
            kept["row"].to_numpy(),
            kept["start"].to_numpy(),
            kept["end"].to_numpy(),
            kept["text"].to_numpy(),
            kept["tag"].to_numpy(),
        ):
            texts_by_row.setdefault(row, []).append(txt)
            spans_by_row.setdefault(row, []).append(
                {"start": int(s), "end": int(e), "kind": tag}
            )
        joined = pd.Series(
            {r: "\n".join(v) for r, v in texts_by_row.items()}
        ).str.normalize("NFKC")
        out.loc[joined.index, "extracted_text"] = joined
        for idx, sl in spans_by_row.items():
            out.at[idx, "spans"] = sl
    return out
