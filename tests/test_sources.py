"""On-disk corpus source tests: format parity, schema conformance."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nmalign_ray.schema import CORPUS_SCHEMA, EngineConfig
from nmalign_ray.sources import (
    CorpusSchemaError,
    read_corpus,
    spans_from_lines,
)


def _docs(n=6):
    docs = []
    for i in range(n):
        lines = [f"alpha beta {i}", f"gamma delta {i} epsilon"]
        docs.append({
            "doc_id": f"doc-{i}",
            "spans": spans_from_lines(lines),
            "ref_spans": spans_from_lines(lines),
        })
    return docs


def _collect(ds, ray_session):
    tables = [t for t in map(ray_session.get, ds.to_arrow_refs())
              if t.num_rows]
    return pa.concat_tables(tables).sort_by("doc_id")


@pytest.fixture()
def corpus_dir(tmp_path):
    docs = _docs()
    tbl = pa.Table.from_pylist(docs).select(
        ["doc_id", "spans", "ref_spans"])
    pq.write_table(tbl, tmp_path / "c.parquet")
    with open(tmp_path / "c.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return str(tmp_path)


class TestReadCorpus:
    def test_parquet_and_jsonl_agree_on_canonical_schema(
            self, ray_session, corpus_dir):
        a = _collect(read_corpus(os.path.join(corpus_dir, "c.parquet"),
                                 "parquet"), ray_session)
        b = _collect(read_corpus(os.path.join(corpus_dir, "c.jsonl"),
                                 "jsonl"), ray_session)
        # the JSON reader alphabetizes struct fields and widens offset
        # to int64; both must come back as the canonical span schema
        assert a.schema.equals(CORPUS_SCHEMA)
        assert b.schema.equals(CORPUS_SCHEMA)
        assert a.equals(b)

    def test_missing_column_raises_loudly(self, ray_session, tmp_path):
        tbl = pa.Table.from_pydict(
            {"doc_id": pa.array(["d"], pa.string())})
        pq.write_table(tbl, tmp_path / "bad.parquet")
        with pytest.raises(Exception) as exc_info:
            # ReadParquet itself rejects the missing projection column,
            # or _conform raises CorpusSchemaError — either way loud
            read_corpus(str(tmp_path / "bad.parquet"), "parquet"
                        ).materialize()
        assert "spans" in str(exc_info.value)

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError):
            read_corpus("/tmp/x", "orc")

    def test_flat_csv_roundtrip(self, ray_session, corpus_dir, tmp_path):
        # explode to the flat one-row-per-span shape, export CSV, read it
        # back via the assembly shuffle — must reproduce the canonical
        # corpus exactly (side/offset ordering, empty media_ref restored)
        import pandas as pd

        from nmalign_ray.sources import explode_corpus, read_flat_corpus

        src = read_corpus(os.path.join(corpus_dir, "c.parquet"), "parquet")
        flat = explode_corpus(src).to_pandas()
        csv_dir = tmp_path / "flat"
        csv_dir.mkdir()
        flat.to_csv(csv_dir / "rows.csv", index=False)
        back = _collect(
            read_flat_corpus(str(csv_dir / "rows.csv"), "csv"), ray_session)
        want = _collect(
            read_corpus(os.path.join(corpus_dir, "c.parquet"), "parquet"),
            ray_session)
        assert back.schema.equals(CORPUS_SCHEMA)
        assert back.equals(want)

    def test_jsonl_sink_roundtrips(self, ray_session, corpus_dir, tmp_path):
        from nmalign_ray.sources import write_corpus

        src = read_corpus(os.path.join(corpus_dir, "c.parquet"), "parquet")
        out = tmp_path / "sink"
        out.mkdir()
        write_corpus(src, str(out), format="jsonl")
        files = [str(out / f) for f in os.listdir(out)]
        back = _collect(read_corpus(files, "jsonl"), ray_session)
        want = _collect(
            read_corpus(os.path.join(corpus_dir, "c.parquet"), "parquet"),
            ray_session)
        assert back.equals(want)

    def test_corpus_runs_through_checkpointed_pipeline(
            self, ray_session, corpus_dir, tmp_path):
        from nmalign_ray.pipelines.checkpoint import (
            read_output,
            run_checkpointed,
        )

        ds = read_corpus(os.path.join(corpus_dir, "c.jsonl"), "jsonl")
        out = str(tmp_path / "out")
        summary = run_checkpointed(
            ds, out, EngineConfig(num_partitions=4))
        assert summary["num_docs"] == 6
        result = read_output(out)
        # identity corpus: every span aligns to itself
        assert result.num_rows == 6
        assert summary["matched"] == summary["total"]
