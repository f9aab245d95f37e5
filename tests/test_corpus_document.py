"""Tests for the corpus generator, extraction front-end, and per-document kernel."""

import numpy as np
import pyarrow as pa
import pytest

from nmalign_ray.corpus import FAMILIES, generate_corpus, make_document, make_skewed_document
from nmalign_ray.document import oracle_table, process_document, salt_chunks
from nmalign_ray.extract import classify_spans
from nmalign_ray.extract.html import extract_html_blocks
from nmalign_ray.extract.pdf import parse_pdf_text
from nmalign_ray.schema import CORPUS_SCHEMA, OUTPUT_SCHEMA, DEFAULT_NORMALIZATION
from nmalign_ray.align import AlignConfig

CFG = AlignConfig(normalization=DEFAULT_NORMALIZATION, try_subseg=True)


class TestGenerator:
    def test_deterministic(self):
        a = generate_corpus(20, seed=42)
        b = generate_corpus(20, seed=42)
        assert a.equals(b)

    def test_seed_changes_content(self):
        a = generate_corpus(5, seed=42)
        b = generate_corpus(5, seed=43)
        assert not a.equals(b)

    def test_schema(self):
        t = generate_corpus(10)
        assert t.schema.equals(CORPUS_SCHEMA)

    def test_offsets_strictly_increasing_in_refs(self):
        t = generate_corpus(len(FAMILIES) * 2)
        for refs in t["ref_spans"].to_pylist():
            offs = [r["offset"] for r in refs]
            assert offs == sorted(offs)

    def test_merged_docs_have_fewer_input_spans(self):
        _, spans, refs = make_document(3, "merged", seed=42)
        assert len(spans) < len(refs)


class TestExtractors:
    def test_html_strips_boilerplate(self):
        html = (
            '<div><nav><a href="/">home</a> | <a href="/a">about</a></nav>'
            "<p>Der Verstand ist das Licht der Welt.</p>"
            "<p>Die Vernunft folgt dem Gesetz der Natur.</p>"
            "<footer>© 1784 impressum</footer></div>"
        )
        blocks = extract_html_blocks(html)
        assert blocks == [
            "Der Verstand ist das Licht der Welt.",
            "Die Vernunft folgt dem Gesetz der Natur.",
        ]

    def test_html_drops_link_farms(self):
        html = '<p><a href="/1">eins</a> <a href="/2">zwei</a> <a href="/3">drei lange links</a></p>'
        assert extract_html_blocks(html) == []

    def test_pdf_dehyphenation_roundtrip(self):
        text = "Die Aufklaͤ⸗\nrung ist der Aus-\ngang des Menschen"
        assert parse_pdf_text(text) == ["Die Aufklaͤrung ist der Ausgang des Menschen"]

    def test_pdf_paragraph_split(self):
        assert parse_pdf_text("eins zwei\ndrei\n\nvier fuenf") == [
            "eins zwei drei",
            "vier fuenf",
        ]

    def test_classify_sorts_by_offset_and_filters_empties(self):
        kinds = ["text", "text", "image", "text"]
        texts = ["zweiter", "   ", "", "erster"]
        refs = ["", "", "media://m/1", ""]
        offsets = [5, 3, 2, 1]
        cands, media = classify_spans(kinds, texts, refs, offsets)
        assert [c.text for c in cands] == ["erster", "zweiter"]
        assert media[0].media_ref == "media://m/1" and media[0].offset == 2


class TestSaltChunks:
    def test_single_chunk_below_threshold(self):
        assert salt_chunks(10, 12, 256) == [(0, 10, 0, 12)]

    def test_chunks_cover_and_are_bounded(self):
        chunks = salt_chunks(1000, 900, 256)
        assert chunks[0][0] == 0 and chunks[-1][1] == 1000
        assert chunks[0][2] == 0 and chunks[-1][3] == 900
        for (c0, c1, r0, r1), nxt in zip(chunks, chunks[1:]):
            assert c1 == nxt[0] and r1 == nxt[2]
        assert all(c1 - c0 <= 256 for c0, c1, _, _ in chunks)

    def test_zero_threshold_disables(self):
        assert salt_chunks(1000, 1000, 0) == [(0, 1000, 0, 1000)]


class TestProcessDocument:
    def test_identity_roundtrip(self):
        _, spans, refs = make_document(0, "identity", seed=42)
        out, metrics = process_document(spans, refs, CFG)
        assert metrics["matched"] == metrics["total"] == len(refs)
        assert metrics["mean_score"] == pytest.approx(1.0)
        assert [(s["text"], s["offset"]) for s in out] == [
            (r["text"], r["offset"]) for r in refs
        ]

    def test_media_passthrough(self):
        _, spans, refs = make_document(6, "media", seed=42)
        out, _ = process_document(spans, refs, CFG)
        in_media = [(s["kind"], s["media_ref"], s["offset"])
                    for s in spans if s["media_ref"]]
        out_media = [(s["kind"], s["media_ref"], s["offset"])
                     for s in out if s["media_ref"]]
        assert in_media == out_media and len(in_media) > 0

    def test_output_sorted_by_offset(self):
        for fam in FAMILIES:
            _, spans, refs = make_document(9, fam, seed=42)
            out, _ = process_document(spans, refs, CFG)
            offs = [s["offset"] for s in out]
            assert offs == sorted(offs), fam

    def test_html_pdf_families_fully_align(self):
        for fam in ("html", "pdf"):
            _, spans, refs = make_document(2, fam, seed=42)
            out, metrics = process_document(spans, refs, CFG)
            assert metrics["matched"] == metrics["total"], fam
            assert all(s["kind"] == fam for s in out
                       if s["media_ref"] == "" and s["kind"] != "text")

    def test_short_refs_can_stay_unmatched(self):
        _, spans, refs = make_document(4, "short", seed=42)
        out, metrics = process_document(spans, refs, CFG)
        unmatched = metrics["total"] - metrics["matched"]
        assert unmatched >= 0
        # any unmatched ref must be a short line (reference rule: only
        # <=4-char lines may go unmatched, tests/test_all.py:46-52)
        out_offsets = {s["offset"] for s in out}
        for r in refs:
            if r["offset"] not in out_offsets and r["text"]:
                assert len(r["text"]) <= 4

    def test_skewed_chunked_equals_whole(self):
        _, spans, refs = make_skewed_document(0, 42, 200)
        out_c, m_c = process_document(spans, refs, CFG, salt_threshold=64)
        out_w, m_w = process_document(spans, refs, CFG, salt_threshold=0)
        assert out_c == out_w and m_c == m_w

    def test_no_refs_yields_media_only(self):
        spans = [{"kind": "image", "text": "", "media_ref": "media://x/0", "offset": 0}]
        out, metrics = process_document(spans, [], CFG)
        assert len(out) == 1 and metrics["total"] == 0

    def test_no_candidates_yields_no_matches(self):
        refs = [{"kind": "text", "text": "nur referenz", "media_ref": "", "offset": 0}]
        out, metrics = process_document([], refs, CFG)
        assert out == [] and metrics["matched"] == 0 and metrics["total"] == 1


class TestOracleTable:
    def test_schema_and_determinism(self):
        corpus = generate_corpus(12, seed=42)
        g1 = oracle_table(corpus, CFG)
        g2 = oracle_table(corpus, CFG)
        assert g1.schema.equals(OUTPUT_SCHEMA)
        assert g1.equals(g2)

    def test_coverage_outside_short_families(self):
        corpus = generate_corpus(len(FAMILIES) * 3, seed=42)
        g = oracle_table(corpus, CFG).to_pandas()
        fams = g.doc_id.str.split("-").str[1]
        full = g[~fams.isin(["short", "mixed", "merged"])]
        cov = full.matched / full.total.clip(lower=1)
        assert (cov >= 0.95).all()


class TestRollup:
    def test_rollup_joins_in_order_with_media_markers(self):
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [
            {"kind": "text", "text": "erste zeile", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://x/1", "offset": 1},
            {"kind": "html", "text": "zweite zeile", "media_ref": "", "offset": 2},
        ]
        assert rollup_spans(spans) == "erste zeile\n[image:media://x/1]\nzweite zeile"

    def test_rollup_bottom_to_top_reverses_span_order(self):
        # columnar counterpart of the reference's
        # textLineOrder=bottom-to-top traversal (ocrd/cli.py:390-393)
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [
            {"kind": "text", "text": "unterste zeile", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "mittlere", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "oberste", "media_ref": "", "offset": 2},
        ]
        assert rollup_spans(spans, bottom_to_top=True) == (
            "oberste\nmittlere\nunterste zeile"
        )
        # the +join no-separator rule composes with the reversal
        spans[1]["kind"] = "text+join"
        assert rollup_spans(spans, bottom_to_top=True) == (
            "oberstemittlere\nunterste zeile"
        )

    def test_rollup_rtl_reverses_words_and_glyphs(self):
        # page-level readingDirection=RIGHTTOLEFT (ocrd/cli.py:396-418):
        # word order within the line reversed AND glyph order within
        # each word reversed; media placeholder fragments pass through
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [
            {"kind": "text", "text": "abc def gh", "media_ref": "",
             "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://x/1",
             "offset": 1},
        ]
        assert rollup_spans(spans, rtl=True) == (
            "hg fed cba\n[image:media://x/1]"
        )
        # composes with bottom_to_top (both reversals are per-span /
        # per-document independent)
        spans2 = [
            {"kind": "text", "text": "ab cd", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "ef", "media_ref": "", "offset": 1},
        ]
        assert rollup_spans(spans2, bottom_to_top=True, rtl=True) == (
            "fe\ndc ba"
        )

    def test_rollup_batch_schema(self):
        from nmalign_ray.stages.rollup import ROLLUP_SCHEMA, rollup_batch
        from nmalign_ray.document import oracle_table
        from nmalign_ray.corpus import generate_corpus

        golden = oracle_table(generate_corpus(6, seed=42), CFG)
        out = rollup_batch(golden)
        assert out.schema.equals(ROLLUP_SCHEMA)
        assert out.num_rows == golden.num_rows
        assert all("\n" in t or len(t) >= 0 for t in out["text"].to_pylist())


class TestHtmlRobustness:
    def test_unclosed_tags_and_entities(self):
        html = "<div><p>Der Geist &amp; die Vernunft sind frei<p>Zweiter Absatz ohne Ende"
        blocks = extract_html_blocks(html)
        assert "Der Geist & die Vernunft sind frei" in blocks
        assert "Zweiter Absatz ohne Ende" in blocks

    def test_plain_text_without_markup_passes_through(self):
        assert extract_html_blocks("Nur einfacher Text ohne Markup.") == [
            "Nur einfacher Text ohne Markup."
        ]

    def test_nested_chrome_is_stripped_entirely(self):
        html = ("<nav><div><p>menu item that is long enough</p></div></nav>"
                "<p>Nur dieser Inhalt bleibt übrig.</p>")
        assert extract_html_blocks(html) == ["Nur dieser Inhalt bleibt übrig."]

    def test_empty_and_garbage_input(self):
        assert extract_html_blocks("") == []
        # malformed markup degrades to data (lenient parse), never crashes
        assert extract_html_blocks("<<<>>><&&&") == ["<<<>>><&&&"]


class TestRollupJoinRule:
    def test_join_suffix_concatenates_without_separator(self):
        # columnar Relation type=join (/root/reference/nmalign/ocrd/cli.py:354-358)
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [
            {"kind": "text", "text": "zusammen", "media_ref": "", "offset": 0},
            {"kind": "text+join", "text": "geschrieben", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "neue zeile", "media_ref": "", "offset": 2},
        ]
        assert rollup_spans(spans) == "zusammengeschrieben\nneue zeile"

    def test_join_suffix_on_first_span_starts_fragment(self):
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [{"kind": "text+join", "text": "solo", "media_ref": "", "offset": 0}]
        assert rollup_spans(spans) == "solo"

    def test_join_suffix_stripped_from_media_marker(self):
        from nmalign_ray.stages.rollup import rollup_spans

        spans = [
            {"kind": "text", "text": "zeile", "media_ref": "", "offset": 0},
            {"kind": "image+join", "text": "", "media_ref": "media://x/1", "offset": 1},
        ]
        assert rollup_spans(spans) == "zeile[image:media://x/1]"
