"""End-to-end: Ray pipeline output == single-process oracle, span for span.

This is the correctness gate of BASELINE.json lifted into the test suite:
per-doc span-sequence equality on (kind, text, media_ref, order) between
the distributed pipeline and the reference-semantics oracle.
"""

import pyarrow as pa
import pytest

from nmalign_ray.corpus import generate_corpus
from nmalign_ray.document import oracle_table
from nmalign_ray.pipelines import build_extract_pipeline, join_refs
from nmalign_ray.schema import OUTPUT_SCHEMA, EngineConfig


@pytest.fixture(scope="module")
def corpus():
    # all fixture families + one skewed doc above the salt threshold
    return generate_corpus(num_docs=40, seed=42, skewed_spans=150)


@pytest.fixture(scope="module")
def config():
    return EngineConfig(salt_threshold=64, align_batch_size=8, align_concurrency=2)


@pytest.fixture(scope="module")
def golden(corpus, config):
    return oracle_table(corpus, config=config.align, salt_threshold=config.salt_threshold)


def spans_key(table: pa.Table):
    """doc_id -> [(kind, text, media_ref, order)] judged tuple sequence."""
    out = {}
    for did, spans in zip(table["doc_id"].to_pylist(), table["spans"].to_pylist()):
        out[did] = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
    return out


def run_pipeline(ray_session, corpus, config):
    ds = ray_session.data.from_arrow(corpus)
    return build_extract_pipeline(ds, config).to_arrow_refs()


class TestPipelineMatchesOracle:
    @pytest.fixture(scope="class")
    def result(self, ray_session, corpus, config):
        ds = ray_session.data.from_arrow(corpus)
        out = build_extract_pipeline(ds, config)
        # empty shuffle partitions emit zero-row COLUMN-LESS blocks that
        # bypass the UDF — filter them when consuming to_arrow_refs (the
        # repo's standard rule; ranked_docs does the same)
        blocks = [ray_session.get(ref) for ref in out.to_arrow_refs()]
        tbl = pa.concat_tables([b for b in blocks if b.num_rows])
        return tbl

    def test_row_count(self, result, golden):
        assert result.num_rows == golden.num_rows

    def test_schema(self, result):
        assert set(result.schema.names) == set(OUTPUT_SCHEMA.names)

    def test_span_sequence_equality(self, result, golden):
        got = spans_key(result)
        want = spans_key(golden)
        assert set(got) == set(want)
        mismatches = {d for d in want if got[d] != want[d]}
        assert not mismatches, f"span-sequence mismatch for {sorted(mismatches)[:5]}"

    def test_metrics_match(self, result, golden):
        got = {
            d: (round(m, 9), ma, t, u)
            for d, m, ma, t, u in zip(
                result["doc_id"].to_pylist(),
                result["mean_score"].to_pylist(),
                result["matched"].to_pylist(),
                result["total"].to_pylist(),
                result["unmatched_ref_count"].to_pylist(),
            )
        }
        want = {
            d: (round(m, 9), ma, t, u)
            for d, m, ma, t, u in zip(
                golden["doc_id"].to_pylist(),
                golden["mean_score"].to_pylist(),
                golden["matched"].to_pylist(),
                golden["total"].to_pylist(),
                golden["unmatched_ref_count"].to_pylist(),
            )
        }
        assert got == want

    def test_determinism_two_runs(self, ray_session, corpus, config, result):
        ds = ray_session.data.from_arrow(corpus)
        out2 = build_extract_pipeline(ds, config)
        tbl2 = pa.concat_tables(
            [t for t in map(ray_session.get, out2.to_arrow_refs())
             if t.num_rows])
        assert spans_key(tbl2) == spans_key(result)


class TestTwoTableJoin:
    def test_join_refs_equivalent(self, ray_session, corpus, config, golden):
        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs = ray_session.data.from_arrow(corpus.select(["doc_id", "ref_spans"]))
        joined = join_refs(inputs, refs, num_partitions=4)
        out = build_extract_pipeline(joined, config)
        tbl = pa.concat_tables(
            [t for t in map(ray_session.get, out.to_arrow_refs())
             if t.num_rows])
        assert spans_key(tbl) == spans_key(golden)

    def test_join_drops_missing_refs(self, ray_session, corpus, config):
        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs_tbl = corpus.select(["doc_id", "ref_spans"]).slice(0, 10)
        refs = ray_session.data.from_arrow(refs_tbl)
        joined = join_refs(inputs, refs, num_partitions=4)
        out = build_extract_pipeline(joined, config)
        assert out.count() == 10


class TestLocalReassembly:
    def test_local_equals_shuffle_and_oracle(self, ray_session, corpus, config, golden):
        ds = ray_session.data.from_arrow(corpus)
        out = build_extract_pipeline(ds, config, reassemble="local")
        tbl = pa.concat_tables(
            [t for t in map(ray_session.get, out.to_arrow_refs())
             if t.num_rows])
        assert spans_key(tbl) == spans_key(golden)

    def test_local_metrics_match_oracle(self, ray_session, corpus, config, golden):
        ds = ray_session.data.from_arrow(corpus)
        out = build_extract_pipeline(ds, config, reassemble="local").to_pandas()
        want = golden.to_pandas()
        merged = out.merge(want, on="doc_id", suffixes=("", "_w"))
        assert (merged.matched == merged.matched_w).all()
        assert (merged.total == merged.total_w).all()


class TestJoinEdges:
    def test_join_drops_refs_without_inputs(self, ray_session, corpus, config):
        # the other direction of OCRD_MISSING_INPUT=SKIP: a reference
        # segmentation with no matching input document is dropped too
        inputs_tbl = corpus.select(["doc_id", "spans"]).slice(0, 8)
        inputs = ray_session.data.from_arrow(inputs_tbl)
        refs = ray_session.data.from_arrow(corpus.select(["doc_id", "ref_spans"]))
        joined = join_refs(inputs, refs, num_partitions=4)
        assert joined.count() == 8


class TestJoinCardinality:
    def test_duplicate_ref_raises(self, ray_session, corpus):
        # reference NonUniqueInputFile (/root/reference/nmalign/ocrd/cli.py:64-67)
        from nmalign_ray.pipelines.extract import NonUniqueRefError

        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs_tbl = corpus.select(["doc_id", "ref_spans"])
        dup = pa.concat_tables([refs_tbl, refs_tbl.slice(0, 1)])
        refs = ray_session.data.from_arrow(dup)
        joined = join_refs(inputs, refs, num_partitions=4)
        with pytest.raises(Exception) as exc:
            joined.count()
        assert "NonUniqueRefError" in str(exc.value) or isinstance(
            exc.value, NonUniqueRefError)

    def test_duplicate_last_mode_keeps_last(self, ray_session, corpus):
        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs_tbl = corpus.select(["doc_id", "ref_spans"])
        dup = pa.concat_tables([refs_tbl, refs_tbl.slice(0, 1)])
        refs = ray_session.data.from_arrow(dup)
        joined = join_refs(inputs, refs, num_partitions=4, on_duplicate="last")
        assert joined.count() == corpus.num_rows

    def test_missing_abort_raises(self, ray_session, corpus):
        # OCRD_MISSING_INPUT=ABORT (/root/reference/nmalign/ocrd/cli.py:101-107)
        from nmalign_ray.pipelines.extract import MissingInputError

        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs = ray_session.data.from_arrow(
            corpus.select(["doc_id", "ref_spans"]).slice(0, 10))
        joined = join_refs(inputs, refs, num_partitions=4, missing="abort")
        with pytest.raises(Exception) as exc:
            joined.count()
        assert "MissingInputError" in str(exc.value) or isinstance(
            exc.value, MissingInputError)

    def test_bad_modes_rejected(self, ray_session, corpus):
        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs = ray_session.data.from_arrow(corpus.select(["doc_id", "ref_spans"]))
        with pytest.raises(ValueError):
            join_refs(inputs, refs, missing="bogus")
        with pytest.raises(ValueError):
            join_refs(inputs, refs, on_duplicate="bogus")


class TestGlyphFamily:
    def test_glyph_output_is_glyph_noised_refs(self, ray_session):
        # the SQL-reconstruction contract behind extract_align_glyph: the
        # pipeline emits the RAW glyph-noised candidate per ref segment,
        # 1:1 in order, at score exactly 1.0
        from nmalign_ray.corpus import corpus_from_documents, glyph_noise

        texts = ["aufklärung ist der ausgang des menschen aus seiner "
                 "selbstverschuldeten unmündigkeit größe übermut wörter",
                 "der mut sich seines verstandes zu bedienen süß schön"]
        tbl = corpus_from_documents(texts, [0, 1], families=("glyph",))
        out = build_extract_pipeline(
            ray_session.data.from_arrow(tbl),
            EngineConfig(align_concurrency=2),
        ).to_pandas().sort_values("doc_id")
        assert (out["mean_score"] == 1.0).all()
        assert (out["matched"] == out["total"]).all()
        for text, (_, row) in zip(texts, out.iterrows()):
            words = text.split()
            segs = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
            got = [s["text"] for s in row["spans"]]
            assert got == [glyph_noise(s, None) for s in segs]


class TestAlignModes:
    def test_task_and_actor_forms_agree_span_for_span(
        self, ray_session, corpus, config, golden
    ):
        # the default TASK form must equal both the actor-pool form and
        # the serial oracle on the full fixture mix (incl. salted skew) —
        # this is the direct pin on align_chunks_batch, which the
        # actor-pinned configs elsewhere never exercise
        tasks_cfg = EngineConfig(salt_threshold=64, align_batch_size=8,
                                 align_mode="tasks")
        out_tasks = build_extract_pipeline(
            ray_session.data.from_arrow(corpus), tasks_cfg)
        got = spans_key(pa.concat_tables(
            [t for t in map(ray_session.get, out_tasks.to_arrow_refs())
             if t.num_rows]))
        assert got == spans_key(golden)

    def test_mode_validation(self, ray_session, corpus):
        ds = ray_session.data.from_arrow(corpus)
        with pytest.raises(ValueError, match="align_mode must be"):
            build_extract_pipeline(ds, EngineConfig(align_mode="actor"))
        with pytest.raises(ValueError, match="contradicts"):
            build_extract_pipeline(
                ds, EngineConfig(align_mode="tasks", align_concurrency=4))

    def test_explicit_pool_width_is_clamped(self):
        # an explicit align_concurrency as wide as the cluster would
        # deadlock the streaming executor; resolve_concurrency caps it
        import ray as _ray

        from nmalign_ray.pipelines.extract import resolve_concurrency

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        assert resolve_concurrency(
            EngineConfig(align_concurrency=cpus + 5)) == cpus - 1
        lo, hi = resolve_concurrency(
            EngineConfig(align_concurrency=(2, cpus + 5)))
        assert hi == cpus - 1 and lo == 2

    def test_explicit_actors_mode_runs(self, ray_session, corpus, golden):
        out = build_extract_pipeline(
            ray_session.data.from_arrow(corpus),
            EngineConfig(salt_threshold=64, align_batch_size=8,
                         align_mode="actors", align_concurrency=2))
        got = spans_key(pa.concat_tables(
            [t for t in map(ray_session.get, out.to_arrow_refs())
             if t.num_rows]))
        assert got == spans_key(golden)
