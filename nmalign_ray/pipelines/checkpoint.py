"""Checkpointed partitioned sink with per-partition lineage + resume.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  This generalizes the reference's page-granular
idempotency (skip pages whose output file already exists,
``/root/reference/nmalign/ocrd/cli.py:178-184``) to partition granularity:

* every document belongs to a deterministic partition
  ``pid = crc32(doc_id) % P`` (stable across runs and machines — NOT
  Python's salted ``hash``);
* the reassembly shuffle is keyed on ``pid`` (one hash shuffle total:
  it co-locates all chunks of a document AND all documents of a
  partition), and the per-group task reassembles its documents, writes
  ``out_dir/part=<pid>/data.parquet`` ATOMICALLY (tmp + rename) and a
  lineage record ``out_dir/_manifest/part-<pid>.json`` with row counts
  and metrics;
* on resume, completed partitions are read from the manifest and their
  documents are filtered out right after the read — the heavy stages
  never see them.

A partition directory without its manifest entry is a torn write from a
killed run; it is overwritten on resume.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import partial

import pyarrow as pa
import pyarrow.compute  # noqa: F401  (pa.compute used below; not auto-imported)
import pyarrow.parquet as pq
import ray.data

from ..schema import EngineConfig, OUTPUT_SCHEMA, crc32_shard
from ..stages import extract_and_salt
from .extract import apply_align_stage
from ..stages.reassemble import reassemble_group


def doc_partition(doc_id: str, num_partitions: int) -> int:
    return crc32_shard(doc_id, num_partitions)


def resolve_num_partitions(out_dir: str, cfg: EngineConfig) -> int:
    """Resolve the partition count for a checkpointed job and PIN it.

    ``pid = crc32(doc_id) % P`` means P must be identical across a crash
    and its resume or the completed-partition filter skips the wrong
    documents — so the first run writes ``_manifest/meta.json`` and every
    later run (any cpu count) reads P back from it.  An explicit config
    value that CONTRADICTS a pinned manifest is an error, not a silent
    re-partitioning."""
    meta_path = os.path.join(out_dir, "_manifest", "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            pinned = int(json.load(f)["num_partitions"])
        if cfg.num_partitions is not None and cfg.num_partitions != pinned:
            raise ValueError(
                f"checkpoint at {out_dir} was written with num_partitions="
                f"{pinned}; config asks for {cfg.num_partitions} — resume "
                "must keep the original partitioning")
        return pinned
    if completed_partitions(out_dir) and cfg.num_partitions is None:
        # a pre-meta.json checkpoint (older layout) being resumed with
        # the auto default: re-deriving P from TODAY'S cluster would
        # re-key crc32 % P and silently skip/duplicate documents — the
        # caller must state the original value explicitly (it is then
        # pinned going forward)
        raise ValueError(
            f"checkpoint at {out_dir} has completed partitions but no "
            "_manifest/meta.json (written by an older version); pass the "
            "original num_partitions explicitly to resume it")
    num = cfg.resolved_partitions()
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": num}, f)
    os.replace(tmp, meta_path)
    return num


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
            done.add(int(rec["pid"]))
    return done


def _filter_completed(batch: pa.Table, done: frozenset, num_partitions: int) -> pa.Table:
    if not done:
        return batch
    keep = [
        doc_partition(d, num_partitions) not in done
        for d in batch["doc_id"].to_pylist()
    ]
    return batch.filter(pa.array(keep, type=pa.bool_()))


def _add_pid(batch: pa.Table, num_partitions: int) -> pa.Table:
    pids = pa.array(
        [doc_partition(d, num_partitions) for d in batch["doc_id"].to_pylist()],
        type=pa.int32(),
    )
    return batch.append_column("pid", pids)


def _write_partition(group: pa.Table, out_dir: str) -> pa.Table:
    """Reassemble every document of one partition and write it atomically."""
    pid = int(group["pid"][0].as_py())
    # per-document reassembly within the partition group
    by_doc: dict[str, list[int]] = {}
    for k, did in enumerate(group["doc_id"].to_pylist()):
        by_doc.setdefault(did, []).append(k)
    docs = [
        reassemble_group(group.take(idxs)) for _, idxs in sorted(by_doc.items())
    ]
    table = pa.concat_tables(docs) if docs else OUTPUT_SCHEMA.empty_table()

    part_dir = os.path.join(out_dir, f"part={pid}")
    tmp_dir = os.path.join(out_dir, "_tmp", f"part={pid}")
    os.makedirs(os.path.dirname(tmp_dir), exist_ok=True)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))
    shutil.rmtree(part_dir, ignore_errors=True)
    os.replace(tmp_dir, part_dir)

    matched = int(pa.compute.sum(table["matched"]).as_py() or 0)
    total = int(pa.compute.sum(table["total"]).as_py() or 0)
    manifest = {
        "pid": pid,
        "num_docs": table.num_rows,
        "matched": matched,
        "total": total,
        "unmatched_ref_count": int(
            pa.compute.sum(table["unmatched_ref_count"]).as_py() or 0
        ),
    }
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f".part-{pid}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(mdir, f"part-{pid}.json"))

    return pa.Table.from_pydict(
        {k: [v] for k, v in manifest.items()},
        schema=pa.schema(
            [
                ("pid", pa.int64()),
                ("num_docs", pa.int64()),
                ("matched", pa.int64()),
                ("total", pa.int64()),
                ("unmatched_ref_count", pa.int64()),
            ]
        ),
    )


def run_checkpointed(
    corpus: ray.data.Dataset,
    out_dir: str,
    config: EngineConfig | None = None,
    collect_stats: bool = False,
) -> dict:
    """Run the extraction pipeline with a checkpointed sink; returns a job
    summary.  Safe to re-invoke after a crash: completed partitions are
    skipped before the heavy stages.  With ``collect_stats`` the summary
    carries the executed plan's ``Dataset.stats()`` text under ``"stats"``
    (bench.py parses it into per-stage seconds)."""
    cfg = config if config is not None else EngineConfig()
    num_partitions = resolve_num_partitions(out_dir, cfg)
    done = frozenset(completed_partitions(out_dir))

    ds = corpus.map_batches(
        partial(_filter_completed, done=done, num_partitions=num_partitions),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    chunks = ds.map_batches(
        partial(extract_and_salt, salt_threshold=cfg.salt_threshold),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    aligned = apply_align_stage(chunks, cfg).map_batches(
        partial(_add_pid, num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    # NOTE: no repartition before the groupby — the round-2 coalesce
    # (43 s -> 26 s) predates the in-stream bench replicator; with sane
    # upstream block counts the extra all-to-all is pure overhead
    # (A/B measured 16.2/18.8 s with vs 15.3/17.4 s without at 30k docs)
    # and the groupby's own num_partitions bounds the shuffle width.
    result_ds = aligned.groupby("pid", num_partitions=num_partitions).map_groups(
        partial(_write_partition, out_dir=out_dir), batch_format="pyarrow"
    )
    summary = result_ds.to_pandas()
    out = {
        "partitions_written": int(summary.shape[0]),
        "partitions_skipped": len(done),
        "num_docs": int(summary["num_docs"].sum()) if len(summary) else 0,
        "matched": int(summary["matched"].sum()) if len(summary) else 0,
        "total": int(summary["total"].sum()) if len(summary) else 0,
    }
    if collect_stats:
        out["stats"] = result_ds.stats()
    return out


def read_output(out_dir: str) -> pa.Table:
    """Read every completed partition back as one table (small results /
    tests; large outputs should be read with ray.data.read_parquet)."""
    parts = []
    for pid in sorted(completed_partitions(out_dir)):
        path = os.path.join(out_dir, f"part={pid}", "data.parquet")
        parts.append(pq.read_table(path))
    return pa.concat_tables(parts) if parts else OUTPUT_SCHEMA.empty_table()
