"""Checkpointed sink: atomic partition writes, lineage manifest, resume."""

import json
import os
import shutil

import pytest

from nmalign_ray.corpus import generate_corpus
from nmalign_ray.document import oracle_table
from nmalign_ray.pipelines.checkpoint import (
    completed_partitions,
    doc_partition,
    read_output,
    run_checkpointed,
)
from nmalign_ray.schema import EngineConfig


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(num_docs=24, seed=42)


@pytest.fixture(scope="module")
def config():
    return EngineConfig(salt_threshold=64, num_partitions=4,
                        align_batch_size=8, align_concurrency=2)


def spans_key(table):
    return {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in zip(table["doc_id"].to_pylist(), table["spans"].to_pylist())
    }


class TestCheckpointedSink:
    def test_partition_assignment_stable(self):
        assert doc_partition("doc-x", 16) == doc_partition("doc-x", 16)
        assert 0 <= doc_partition("anything", 7) < 7

    def test_full_run_writes_all_partitions(self, ray_session, corpus, config, tmp_path):
        out = str(tmp_path / "out")
        ds = ray_session.data.from_arrow(corpus)
        summary = run_checkpointed(ds, out, config)
        assert summary["partitions_written"] == config.num_partitions
        assert summary["num_docs"] == corpus.num_rows
        assert completed_partitions(out) == set(range(config.num_partitions))
        # manifest carries lineage metrics
        rec = json.load(open(os.path.join(out, "_manifest", "part-0.json")))
        assert {"pid", "num_docs", "matched", "total"} <= set(rec)

    def test_output_matches_oracle(self, ray_session, corpus, config, tmp_path):
        out = str(tmp_path / "out2")
        run_checkpointed(ray_session.data.from_arrow(corpus), out, config)
        got = spans_key(read_output(out))
        want = spans_key(
            oracle_table(corpus, config.align, salt_threshold=config.salt_threshold)
        )
        assert got == want

    def test_resume_skips_completed_and_repairs_missing(
        self, ray_session, corpus, config, tmp_path
    ):
        out = str(tmp_path / "out3")
        ds = ray_session.data.from_arrow(corpus)
        run_checkpointed(ds, out, config)
        full = spans_key(read_output(out))

        # simulate a torn run: partition 1 lost its manifest AND data,
        # partition 2 has data but no manifest (torn write)
        shutil.rmtree(os.path.join(out, "part=1"))
        os.remove(os.path.join(out, "_manifest", "part-1.json"))
        os.remove(os.path.join(out, "_manifest", "part-2.json"))

        summary = run_checkpointed(ds, out, config)
        assert summary["partitions_skipped"] == 2  # 0 and 3 still manifested
        assert summary["partitions_written"] == 2  # 1 and 2 recomputed
        assert completed_partitions(out) == set(range(config.num_partitions))
        assert spans_key(read_output(out)) == full

    def test_partition_count_pinned_across_cluster_sizes(
        self, ray_session, corpus, tmp_path
    ):
        # auto num_partitions (None) resolves from the cluster on the
        # FIRST run and is pinned in the manifest: a resume on a cluster
        # of any other size must keep crc32(doc_id) % P intact
        from nmalign_ray.pipelines.checkpoint import resolve_num_partitions
        from nmalign_ray.schema import EngineConfig as EC

        out = str(tmp_path / "pin")
        auto = EC(num_partitions=None)
        first = resolve_num_partitions(out, auto)
        assert first == auto.resolved_partitions() >= 32
        # simulate resuming on a 4x cluster: the auto value WOULD differ,
        # but the pinned manifest wins
        assert resolve_num_partitions(out, auto) == first
        pinned = json.load(open(os.path.join(out, "_manifest", "meta.json")))
        assert pinned["num_partitions"] == first
        # an explicit conflicting config is an error, not silent re-keying
        with pytest.raises(ValueError, match="must keep the original"):
            resolve_num_partitions(out, EC(num_partitions=first + 1))
        # an explicit MATCHING config is fine
        assert resolve_num_partitions(
            out, EC(num_partitions=first)) == first

    def test_legacy_checkpoint_without_meta_requires_explicit_p(
        self, corpus, tmp_path
    ):
        # a pre-meta.json checkpoint resumed with the auto default must
        # fail loudly — re-deriving P would re-key crc32 % P and corrupt
        # the resume; an explicit P resumes and pins it
        from nmalign_ray.pipelines.checkpoint import resolve_num_partitions
        from nmalign_ray.schema import EngineConfig as EC

        out = str(tmp_path / "legacy")
        mdir = os.path.join(out, "_manifest")
        os.makedirs(mdir)
        with open(os.path.join(mdir, "part-0.json"), "w") as f:
            json.dump({"pid": 0, "num_docs": 1, "matched": 1, "total": 1,
                       "unmatched_ref_count": 0}, f)
        with pytest.raises(ValueError, match="older version"):
            resolve_num_partitions(out, EC(num_partitions=None))
        assert resolve_num_partitions(out, EC(num_partitions=32)) == 32
        # now pinned: auto resolves to the pinned value
        assert resolve_num_partitions(out, EC(num_partitions=None)) == 32

    def test_resume_with_auto_partitions(self, ray_session, corpus, tmp_path):
        # e2e: auto-partitioned run, torn partition, resume repairs it and
        # the output matches the uninterrupted run (the filter reads the
        # pinned P, not a re-derived one)
        cfg = EngineConfig(salt_threshold=64, num_partitions=None,
                           align_batch_size=8, align_concurrency=2)
        out = str(tmp_path / "auto")
        ds = ray_session.data.from_arrow(corpus)
        run_checkpointed(ds, out, cfg)
        full = spans_key(read_output(out))
        victims = sorted(completed_partitions(out))[:2]
        for pid in victims:
            shutil.rmtree(os.path.join(out, f"part={pid}"))
            os.remove(os.path.join(out, "_manifest", f"part-{pid}.json"))
        summary = run_checkpointed(ds, out, cfg)
        assert summary["partitions_written"] == len(victims)
        assert spans_key(read_output(out)) == full

    def test_resume_across_cluster_sizes_fresh_processes(
        self, corpus, tmp_path
    ):
        # the verdict-6 done criterion: a job started on one cluster size
        # and resumed on another (fresh ray sessions, different num_cpus)
        # must produce the same output as an uninterrupted run — the
        # pinned manifest geometry, not the new cluster, owns P
        import subprocess
        import sys

        import pyarrow.parquet as pq

        src = tmp_path / "corpus.parquet"
        pq.write_table(corpus, src)
        out = tmp_path / "out"
        script = """
import sys
import ray
# small explicit object store: this subprocess cluster coexists with the
# pytest session's cluster, and two default-sized stores exhaust /dev/shm
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR",
         object_store_memory=1_000_000_000)
import ray.data
from nmalign_ray.pipelines.checkpoint import run_checkpointed
from nmalign_ray.schema import EngineConfig
ds = ray.data.read_parquet(sys.argv[2])
cfg = EngineConfig(salt_threshold=64, align_batch_size=8,
                   align_concurrency=2)
print(run_checkpointed(ds, sys.argv[3], cfg))
ray.shutdown()
"""
        env = dict(os.environ, PYTHONPATH=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

        def run(ncpu):
            return subprocess.run(
                [sys.executable, "-c", script, str(ncpu), str(src),
                 str(out)],
                env=env, capture_output=True, text=True, check=True,
                timeout=240)

        # 4 and 8 cpus: the 2-actor aligner pool RESERVES its CPUs, so a
        # 2-cpu cluster leaves zero for read/shuffle tasks and the
        # streaming executor starves (observed: init fine, pipeline hangs)
        run(4)
        full = spans_key(read_output(str(out)))
        pinned = json.load(
            open(os.path.join(out, "_manifest", "meta.json")))
        victims = sorted(completed_partitions(str(out)))[:2]
        for pid in victims:
            shutil.rmtree(os.path.join(out, f"part={pid}"))
            os.remove(os.path.join(out, "_manifest", f"part-{pid}.json"))
        run(4)  # resume on a "bigger cluster"
        assert json.load(
            open(os.path.join(out, "_manifest", "meta.json"))) == pinned
        assert spans_key(read_output(str(out))) == full

    def test_noop_when_all_complete(self, ray_session, corpus, config, tmp_path):
        out = str(tmp_path / "out4")
        ds = ray_session.data.from_arrow(corpus)
        run_checkpointed(ds, out, config)
        summary = run_checkpointed(ds, out, config)
        assert summary["partitions_written"] == 0
        assert summary["partitions_skipped"] == config.num_partitions
