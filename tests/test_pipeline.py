"""End-to-end Spark pipeline vs oracle goldens — the port of the reference's
7-case suite (test/01-valid-default.js:16-228, FIXTURES.md §4)."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parse_new_spark import fixtures, oracle, pipeline, spec
from pdf_parse_new_spark.operators import concat, extract


def test_per_turn_byte_equality(spark, smoke_df, golden):
    rows = extract.extract_turns(smoke_df).collect()
    assert len(rows) == len(golden)
    for r in rows:
        ex = golden[(r.conv_id, r.turn_idx)]
        assert r.extracted_text == ex.text, (r.conv_id, r.turn_idx)
        assert r.error == ex.error
        assert r.family == ex.family
        assert [(s.start, s.end, s.kind) for s in r.spans] == ex.spans


def _expected_convs(golden, leading=False, max_turns=0):
    by_conv: dict[str, list] = {}
    for (cid, t), ex in golden.items():
        by_conv.setdefault(cid, []).append((t, ex.text))
    out = {}
    for cid, turns in by_conv.items():
        texts = [x for _, x in sorted(turns)]
        out[cid] = oracle.concat_conversation(texts, leading, max_turns)
    return out


@pytest.mark.parametrize("salted", [False, True])
@pytest.mark.parametrize("leading", [False, True])
def test_conversation_concat(spark, smoke_df, golden, salted, leading):
    opts = pipeline.Options(leading_separator=leading, salted=salted, salt_block=16)
    got = {r.conv_id: r for r in pipeline.extract_conversations(smoke_df, opts).collect()}
    want = _expected_convs(golden, leading=leading)
    assert set(got) == set(want)
    for cid, (text, n, k) in want.items():
        assert got[cid].full_text == text, cid
        assert got[cid].n_turns == n
        assert got[cid].n_extracted == k


@pytest.mark.parametrize("salted", [False, True])
def test_max_turns_limit(spark, smoke_df, golden, salted):
    # case 5 of the reference suite: max = N-1 -> last-turn text absent,
    # n_extracted = N-1, n_turns = N (test/01-valid-default.js:86-114)
    opts = pipeline.Options(max_turns=5, salted=salted, salt_block=4)
    got = {r.conv_id: r for r in pipeline.extract_conversations(smoke_df, opts).collect()}
    want = _expected_convs(golden, max_turns=5)
    for cid, (text, n, k) in want.items():
        assert got[cid].full_text == text
        assert got[cid].n_turns == n
        assert got[cid].n_extracted == k == min(5, n)


def test_max_turns_negative_means_all(spark, smoke_df, golden):
    opts = pipeline.Options(max_turns=-1)
    got = pipeline.extract_conversations(smoke_df, opts).collect()
    for r in got:
        assert r.n_extracted == r.n_turns


def test_null_kernel_is_default(spark, smoke_df):
    # case 2/3: pagerender null/undefined -> default kernel (lib/pdf-parse.js:68)
    a = extract.extract_turns(smoke_df, kernel=None).orderBy("conv_id", "turn_idx")
    b = extract.extract_turns(
        smoke_df, kernel="pdf_parse_new_spark.kernels:extract_batch"
    ).orderBy("conv_id", "turn_idx")
    assert [r.extracted_text for r in a.collect()] == [
        r.extracted_text for r in b.collect()
    ]


def test_custom_kernel_module(spark, smoke_df):
    # case 6/7: custom render honored; module path, not closure
    # (pagerenderModule, index.d.ts:32; constant-callback case
    # test/01-valid-default.js:174-228)
    df = extract.extract_turns(
        smoke_df, kernel="tests.custom_kernels:upper_kernel"
    )
    rows = df.collect()
    assert all(
        r.extracted_text == r.extracted_text.upper() for r in rows if r.extracted_text
    )
    df2 = extract.extract_turns(smoke_df, kernel="tests.custom_kernels:constant_kernel")
    assert {r.extracted_text for r in df2.collect()} == {"CONSTANT"}


def test_title_only_kernel(spark, smoke_df):
    # P5: font-size filter — titles (Tf scale > 12) only, via the example
    # kernel (reference test/examples/09-custom-render.js:62-79)
    full = {
        (r.conv_id, r.turn_idx): r
        for r in extract.extract_turns(smoke_df).collect()
    }
    titles = extract.extract_turns(
        smoke_df, kernel="pdf_parse_new_spark.kernels.examples:title_only_kernel"
    ).collect()
    fewer = 0
    for r in titles:
        base = full[(r.conv_id, r.turn_idx)]
        if r.family != "pdfstream" or r.error is not None:
            assert r.extracted_text == base.extracted_text
            continue
        # every kept line is a line of the full extraction; output shrinks
        base_lines = set(base.extracted_text.split("\n"))
        for line in r.extracted_text.split("\n"):
            if line:
                assert line in base_lines, (r.conv_id, r.turn_idx, line)
        if len(r.extracted_text) < len(base.extracted_text):
            fewer += 1
    assert fewer > 0  # the corpus contains title lines


def test_error_rows_never_fail_job(spark, smoke_df, golden):
    rows = extract.extract_turns(smoke_df).collect()
    n_err = sum(1 for r in rows if r.error is not None)
    want = sum(1 for ex in golden.values() if ex.error is not None)
    assert n_err == want > 0
    for r in rows:
        if r.family == spec.FAM_CORRUPT or (
            r.error is not None and r.extracted_text == ""
        ):
            assert r.extracted_text == ""


def test_all_corrupt_conversation(spark):
    # test-03 analog: a fully corrupt conversation yields empty text +
    # errors, never a job failure
    import datetime

    rows = [
        (
            "allbad",
            i,
            "user",
            fixtures.build_corrupt(__import__("random").Random(i)),
            "",
            datetime.datetime(2024, 1, 1),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, fixtures.TRANSCRIPT_SCHEMA)
    out = pipeline.extract_conversations(df).collect()
    assert len(out) == 1
    assert out[0].n_errors == 4
    assert out[0].full_text == "\n\n".join([""] * 4)


def test_payload_size_guard(spark, smoke_df):
    # X4 analog: oversize payloads become error rows, never job failures
    out = extract.extract_turns(smoke_df, max_payload_bytes=400).collect()
    n_big = sum(1 for r in out if r.error == "payload-too-large")
    assert n_big > 0
    for r in out:
        if r.error == "payload-too-large":
            assert r.extracted_text == "" and list(r.spans) == []
            assert r.family == "corrupt"  # no stale kernel-computed family
    # unguarded run still extracts those rows
    base = {
        (r.conv_id, r.turn_idx): r
        for r in extract.extract_turns(smoke_df).collect()
    }
    assert all(
        base[(r.conv_id, r.turn_idx)].error != "payload-too-large" for r in out
    )


def test_salted_equals_unsalted(spark, smoke_df):
    a = concat.concat_conversations(extract.extract_turns(smoke_df))
    b = concat.concat_conversations_salted(extract.extract_turns(smoke_df), block=7)
    pa = {r.conv_id: r for r in a.collect()}
    pb = {r.conv_id: r for r in b.collect()}
    assert set(pa) == set(pb)
    for cid in pa:
        assert pa[cid].full_text == pb[cid].full_text
        assert pa[cid].n_turns == pb[cid].n_turns
        assert pa[cid].n_extracted == pb[cid].n_extracted
        assert pa[cid].n_errors == pb[cid].n_errors
        assert pa[cid].meta == pb[cid].meta  # families + n_pages map


def test_tree_equals_salted_equals_plain(spark, smoke_df):
    """Three-level tree concat (block -> superblock -> final) must equal
    the one- and two-level plans exactly — tiny block/fanout so every
    level actually merges multiple pieces, plus a max_turns clamp."""
    ex = extract.extract_turns(smoke_df)
    for max_turns in (0, 3):
        a = {r.conv_id: r for r in concat.concat_conversations(
            ex, max_turns=max_turns).collect()}
        t = {r.conv_id: r for r in concat.concat_conversations_tree(
            ex, block=3, fanout=2, max_turns=max_turns).collect()}
        assert set(a) == set(t)
        for cid in a:
            assert a[cid].full_text == t[cid].full_text, (max_turns, cid)
            assert a[cid].n_turns == t[cid].n_turns
            assert a[cid].n_extracted == t[cid].n_extracted
            assert a[cid].n_errors == t[cid].n_errors
            assert a[cid].meta == t[cid].meta


def test_tree_concat_leading_separator_and_sparse_idx(spark):
    # non-dense turn_idx across superblock boundaries + sequential-mode
    # leading separator
    rows = [("c", i * 37, "user", f"t{i} text content", "", None)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    ex = extract.extract_turns(df)
    a = concat.concat_conversations(ex, leading_separator=True).collect()[0]
    t = concat.concat_conversations_tree(
        ex, block=2, fanout=3, leading_separator=True
    ).collect()[0]
    assert a.full_text == t.full_text and a.full_text.startswith("\n\n")
    assert a.n_turns == t.n_turns == 20


def test_conversation_meta_info(spark):
    # P2: the concat meta map carries the first non-null per-turn /Info
    # (reference Result.info); identical in salted and unsalted plans
    from pdf_parse_new_spark import fixtures, pipeline

    df = fixtures.make_transcripts_df(
        spark, n_convs=12, median_turns=8, skew_convs=1, skew_turns=40
    )
    plain = {
        r.conv_id: r.meta
        for r in pipeline.extract_conversations(
            df, pipeline.Options(salted=False)
        ).collect()
    }
    salted = {
        r.conv_id: r.meta
        for r in pipeline.extract_conversations(
            df, pipeline.Options(salt_block=16)
        ).collect()
    }
    assert plain == salted
    assert "info" in next(iter(plain.values()))
    infos = [m["info"] for m in plain.values() if m["info"]]
    assert infos, "corpus must contain PDFs with /Info"
    import json

    for i in infos:
        assert json.loads(i)["producer"] == "pdf-parse-new-spark"
