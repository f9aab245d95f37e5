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
        tbl = pa.concat_tables(
            [ray_session.get(ref) for ref in out.to_arrow_refs()]
        )
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
        tbl2 = pa.concat_tables([ray_session.get(r) for r in out2.to_arrow_refs()])
        assert spans_key(tbl2) == spans_key(result)


class TestTwoTableJoin:
    def test_join_refs_equivalent(self, ray_session, corpus, config, golden):
        inputs = ray_session.data.from_arrow(corpus.select(["doc_id", "spans"]))
        refs = ray_session.data.from_arrow(corpus.select(["doc_id", "ref_spans"]))
        joined = join_refs(inputs, refs, num_partitions=4)
        out = build_extract_pipeline(joined, config)
        tbl = pa.concat_tables([ray_session.get(r) for r in out.to_arrow_refs()])
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
        tbl = pa.concat_tables([ray_session.get(r) for r in out.to_arrow_refs()])
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
