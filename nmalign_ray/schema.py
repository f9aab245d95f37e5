"""Arrow schemas and engine configuration for the extraction pipeline.

The logical data model per ``BASELINE.json:input_hint``: one table of
interleaved text+media documents,

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

optionally paired (same table or a second table joined on ``doc_id``) with
the reference segmentation ``ref_spans`` of the same span type.  This is
the columnar, batched, streaming counterpart of the reference's in-memory
string lists / PAGE-XML DOM (SURVEY §1.2; reference data model at
``/root/reference/nmalign/lib/align.py:17,36-37`` and
``/root/reference/nmalign/ocrd/cli.py:167-217``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .align.core import AlignConfig

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("ref_spans", pa.list_(SPAN_TYPE)),
    ]
)

# two-table variant (exercises the per-doc pair join, reference O1
# zip_input_files -- /root/reference/nmalign/ocrd/cli.py:48-108)
INPUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])
REF_SCHEMA = pa.schema([("doc_id", pa.string()), ("ref_spans", pa.list_(SPAN_TYPE))])

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        # per-doc metric columns (replace the reference's shared
        # mp.Manager stats dict, ocrd/cli.py:110-118, via dataflow)
        ("mean_score", pa.float64()),
        ("matched", pa.int32()),
        ("total", pa.int32()),
        ("unmatched_ref_count", pa.int32()),
    ]
)

TEXT_KINDS = ("text", "html", "pdf")
MEDIA_KINDS = ("image", "audio", "video")


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count for sizing shuffle widths / shard counts —
    THE shared snippet (was copy-pasted 15x across the stages before
    round 5's review).  Falls back to ``default`` outside a Ray session
    so pure-python callers (tests, serial oracles) keep working."""
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def crc32_shard(doc_id: str, num_shards: int) -> int:
    """THE deterministic doc→shard key, shared by every stage that
    co-locates by document (checkpoint partitions, the pair-join shards).
    crc32, not python ``hash()``: stable across worker processes
    (PYTHONHASHSEED), runs and machines — checkpoint resume depends on it
    never changing."""
    import zlib

    return zlib.crc32(str(doc_id).encode("utf-8")) % num_shards

# The reference test-suite's historical-orthography normalization map
# (shape of /root/reference/tests/test_all.py:16-26), the engine default.
DEFAULT_NORMALIZATION = {
    "ſ": "s",
    "aͤ": "ä",
    "oͤ": "ö",
    "uͤ": "ü",
    "Aͤ": "Ä",
    "Oͤ": "Ö",
    "Uͤ": "Ü",
    "⸗": "-",
    " *\n": " ",
}


@dataclass(frozen=True)
class EngineConfig:
    """Job-level configuration (the JSON a ``ray job submit`` entrypoint takes)."""

    align: AlignConfig = field(
        default_factory=lambda: AlignConfig(
            normalization=DEFAULT_NORMALIZATION, try_subseg=True
        )
    )
    # skew handling: documents with more candidate segments than this are
    # salted into contiguous (doc_id, salt) chunks before alignment and
    # re-merged by offset afterwards (north rule; SURVEY §4.2)
    salt_threshold: int = 256
    # actor-pool sizing for the alignment stage: small batches keep task
    # granularity ~0.1-1s so the pool load-balances (a big batch_size makes
    # Ray COALESCE the input into few tasks and serializes the pool);
    # autoscale the pool up to the node's CPU count
    align_batch_size: int = 16
    # physical form of the aligner stage: None (default) = "actors" — a
    # fixed pool pipelines against the read/shuffle stages and wins
    # every LONG corpus-scale run once startup amortizes (A/B 20k-100k
    # docs: 4cpu 65-72 s vs 105-115 s as tasks, 8cpu 29-30 vs 37-38,
    # 32cpu/100k 35.2 vs 47.4).  "tasks" = the right form for SHORT
    # back-to-back verification pipelines, where pool startup/churn
    # dominates (ten sf0.1 family queries: 21 s vs 64-87 s).  "tasks" +
    # an explicit align_concurrency is a rejected contradiction.
    align_mode: str | None = None
    # pool sizing for align_mode="actors": None = a FIXED pool of
    # cpus-2 (an autoscaling pool ramps too slowly and leaves the stage
    # under-parallelized for the first half of the job — measured
    # 13.8s -> 8.9s at sf0.1/32cpu)
    align_concurrency: int | tuple[int, int] | None = None
    # stateless-stage batch size
    extract_batch_size: int = 64
    # output partitioning AND reassembly-shuffle width:
    # partition_id = crc32(doc_id) % num_partitions.
    # None (the default) = derive from the cluster at run time,
    # max(32, CPUs) — a fixed 32 starves the sink at 4N nodes (round-3
    # verdict item 6).  The checkpointed sink PINS the resolved value in
    # its manifest so a resume at a different cpu count keeps the
    # original partitioning (crc32 % P must not change mid-job).
    num_partitions: int | None = None

    def resolved_partitions(self) -> int:
        if self.num_partitions is not None:
            return self.num_partitions
        return max(32, cluster_cpus())
