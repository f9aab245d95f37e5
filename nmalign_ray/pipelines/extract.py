"""The flagship extraction pipeline (SURVEY §3.4).

    read corpus (parquet)                        [doc_id, spans, ref_spans]
      -> map_batches(extract_and_salt)           stateless: parse cascade + skew salting
      -> map_batches(AlignChunks, concurrency=N) forced alignment per chunk
         (actor pool by default — wins long corpus-scale runs; task form
          via align_mode="tasks" for short back-to-back pipelines)
      -> groupby(doc_id).map_groups(reassemble)  shuffle: offset-merge + metrics
      -> OUTPUT_SCHEMA rows

Never calls ``ray.init`` — the session is owned by the caller (driver,
``bench.py``, test fixture).  The pipeline is lazy end to end; consume it
with ``write_parquet`` / ``iter_batches`` / an aggregate, not
``take_all``.
"""

from __future__ import annotations

from functools import partial

import ray.data

from ..schema import EngineConfig, cluster_cpus
from ..stages import AlignChunks, extract_and_salt, reassemble_group


def resolve_concurrency(cfg: EngineConfig):
    """Aligner pool size: explicit config wins (clamped); otherwise a
    FIXED pool of cpus-2 of the current session (headroom for the read /
    shuffle / sink stages)."""
    import ray

    cpus = cluster_cpus()
    # never reserve the LAST cpu — not even for an explicit request:
    # actor pools hold their CPUs for the whole stage, and a pool as
    # wide as the cluster starves the read/shuffle tasks — the streaming
    # executor then deadlocks (observed at num_cpus=2 with a 2-actor
    # pool: init fine, zero progress)
    cap = max(1, cpus - 1)
    if cfg.align_concurrency is not None:
        if isinstance(cfg.align_concurrency, tuple):
            lo, hi = cfg.align_concurrency
            return (min(lo, cap), min(hi, cap))
        return min(cfg.align_concurrency, cap)
    # fixed pool: an autoscaling pool ramps from its floor over the first
    # half of the job and leaves the alignment stage under-parallelized
    # (measured ~14 effective actors of 30 at sf0.1)
    return min(max(2, cpus - 2), cap)


def apply_align_stage(chunks: ray.data.Dataset,
                      cfg: EngineConfig) -> ray.data.Dataset:
    """Attach the alignment stage in the configured physical form.

    Default = ACTORS: a fixed pool PIPELINES against the read/extract
    and shuffle stages, which wins every long corpus-scale run once the
    pool startup amortizes (A/B, same session, 20k-100k docs:
    4 cpus 65-72 s vs 105-115 s as tasks; 8 cpus 29-30 s vs 37-38 s;
    32 cpus/100k docs 35.2 s vs 47.4 s).  ``align_mode='tasks'`` is the
    right form for SHORT verification pipelines run back to back — the
    stage's only state is the process-cached regex program, so tasks get
    warm-once for free and skip the pool's startup/churn, which
    dominates small runs (ten sf0.1 family queries: 21 s as tasks vs
    64-87 s as pools; the driver's sf0.01 sweep shows the same shape).
    Contradictory config (``align_mode='tasks'`` plus a pool size) is an
    error, matching the repo convention for conflicting settings."""
    from ..stages import align_chunks_batch

    mode = cfg.align_mode
    if mode is None:
        mode = "actors"
    elif mode not in ("tasks", "actors"):
        raise ValueError(
            f"align_mode must be 'tasks' or 'actors', got {mode!r}")
    elif mode == "tasks" and cfg.align_concurrency is not None:
        raise ValueError(
            "align_mode='tasks' contradicts an explicit align_concurrency "
            "(pool size); drop one of the two")
    if mode == "actors":
        return chunks.map_batches(
            AlignChunks,
            fn_constructor_kwargs={"config": cfg.align},
            batch_format="pyarrow",
            batch_size=cfg.align_batch_size,
            concurrency=resolve_concurrency(cfg),
            num_cpus=1,
        )
    return chunks.map_batches(
        partial(align_chunks_batch, config=cfg.align),
        batch_format="pyarrow",
        batch_size=cfg.align_batch_size,
    )


def build_extract_pipeline(
    ds: ray.data.Dataset,
    config: EngineConfig | None = None,
    reassemble: str = "shuffle",
) -> ray.data.Dataset:
    """Compose the extraction pipeline over a corpus Dataset
    (``doc_id, spans, ref_spans``); returns the lazy output Dataset.

    ``reassemble``:

    * ``"shuffle"`` (default) — ``groupby(doc_id).map_groups``, the
      north-star exchange: correct unconditionally, including any future
      producer that scatters a document's chunks across blocks.
    * ``"local"`` — zero-shuffle fast path exploiting a producer
      invariant of THIS pipeline: all chunk rows + media of a document
      are emitted contiguously and stay within one aligned output
      block, so per-block grouping reassembles exactly.  PRECISE
      CONDITION: Ray finalizes a map task's output block whenever its
      CUMULATIVE output crosses ``DataContext.target_max_block_size``
      (128 MiB default), and the cut lands on a batch boundary — so a
      document is split only when a task emits >128 MiB AND an
      ``align_batch_size`` boundary falls inside that document.  Keep
      per-task output under the block size (the default batch sizing
      does, for ordinary text corpora) or use the shuffle mode, which
      is correct unconditionally.  Equality with shuffle mode is pinned
      by tests on every fixture family incl. salted skew.
    """
    cfg = config if config is not None else EngineConfig()
    chunks = ds.map_batches(
        partial(extract_and_salt, salt_threshold=cfg.salt_threshold),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    aligned = apply_align_stage(chunks, cfg)
    if reassemble == "local":
        return aligned.map_batches(
            reassemble_block, batch_format="pyarrow", batch_size=None
        )
    # coalesce the aligner's many small output blocks before the shuffle,
    # and bound the shuffle width: the sort-based groupby's scheduling
    # overhead scales with block count, not bytes (measured 43s -> 26s at
    # 30k docs from the coalesce alone)
    num_partitions = cfg.resolved_partitions()
    aligned = aligned.repartition(num_partitions)

    # shuffle on a coarse shard of doc_id (the checkpoint sink's pid
    # keying) and reassemble each document INSIDE the shard task — a
    # per-doc_id groupby pays per-group dispatch at corpus cardinality
    # (measured: 80k groups = 5.7 s of a 6 s stage)
    from ..schema import crc32_shard

    def add_shard(batch: ray.data.Dataset) -> "pa.Table":
        import pyarrow as pa

        return batch.append_column(
            "shard",
            pa.array([crc32_shard(d, num_partitions)
                      for d in batch["doc_id"].to_pylist()], pa.int32()))

    def reassemble_shard(group) -> "pa.Table":
        import pyarrow as pa

        from ..schema import OUTPUT_SCHEMA

        by_doc: dict[str, list[int]] = {}
        for k, did in enumerate(group["doc_id"].to_pylist()):
            by_doc.setdefault(did, []).append(k)
        # cast each doc to the canonical schema: reassemble_group may
        # pass a parquet-read spans column through (list field named
        # "element") or build one ("item"), and concat rejects the mix
        docs = [reassemble_group(group.take(idxs)).cast(OUTPUT_SCHEMA)
                for _, idxs in sorted(by_doc.items())]
        return pa.concat_tables(docs) if docs else OUTPUT_SCHEMA.empty_table()

    return aligned.map_batches(add_shard, batch_format="pyarrow").groupby(
        "shard", num_partitions=num_partitions
    ).map_groups(reassemble_shard, batch_format="pyarrow")


def reassemble_block(batch):
    """Per-block reassembly for the ``local`` mode: group the block's rows
    by doc_id and merge each document (same merge as the shuffle path)."""
    import pyarrow as pa

    from ..schema import OUTPUT_SCHEMA

    by_doc: dict[str, list[int]] = {}
    for k, did in enumerate(batch["doc_id"].to_pylist()):
        by_doc.setdefault(did, []).append(k)
    tables = [
        reassemble_group(batch.take(idxs)) for _, idxs in sorted(by_doc.items())
    ]
    return pa.concat_tables(tables) if tables else OUTPUT_SCHEMA.empty_table()


def read_corpus(path: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=columns)


class NonUniqueRefError(ValueError):
    """A doc_id appeared more than once on one side of the pair join —
    the counterpart of the reference's ``NonUniqueInputFile``
    (``/root/reference/nmalign/ocrd/cli.py:64-67``)."""


class MissingInputError(ValueError):
    """A doc_id was present on only one side and ``missing='abort'`` —
    the counterpart of ``OCRD_MISSING_INPUT=ABORT``
    (``/root/reference/nmalign/ocrd/cli.py:101-107``)."""


def join_refs(
    inputs: ray.data.Dataset,
    refs: ray.data.Dataset,
    num_partitions: int | None = None,
    missing: str = "skip",
    on_duplicate: str = "raise",
) -> ray.data.Dataset:
    """Two-table form: equi-join input spans with the reference
    segmentation on ``doc_id`` (the reference's per-page pair join O1,
    ``/root/reference/nmalign/ocrd/cli.py:48-108`` — 1:1 cardinality).

    ``Dataset.join`` delegates to Acero, which rejects list<struct>
    payload columns, so this is the portable co-group hash join: tag each
    side, union, and merge on a COARSE shard key (``crc32(doc_id) %
    (cpus*4)``), one ``map_groups`` task per shard — never one Ray group
    per document (a per-doc_id groupby costs per-group dispatch, measured
    5.7 s of a 6 s stage at 80k groups; the shard form is the same
    refactor the LSH bucket stage got in round 3).  Inside a shard the
    merge is vectorized: numpy validity masks pick each side's rows and
    ``Table.take`` re-aligns the list<struct> payloads zero-copy — no
    per-cell ``.as_py()``.

    Cardinality is ENFORCED, mirroring the reference:

    * ``on_duplicate='raise'`` (default) raises :class:`NonUniqueRefError`
      when a doc_id repeats on either side (reference
      ``NonUniqueInputFile``); ``'last'`` keeps the last non-null
      occurrence (the pre-enforcement behavior).
    * ``missing='skip'`` (default) drops documents present on only one
      side (``OCRD_MISSING_INPUT=SKIP``); ``'abort'`` raises
      :class:`MissingInputError` (``OCRD_MISSING_INPUT=ABORT``).

    The checks run inside the merge group, so enforcement is distributed
    and surfaces on consumption as a task error wrapping the typed
    exception.
    """
    import numpy as np
    import pyarrow as pa

    from ..schema import CORPUS_SCHEMA, crc32_shard

    if missing not in ("skip", "abort"):
        raise ValueError(f"missing must be 'skip' or 'abort', got {missing!r}")
    if on_duplicate not in ("raise", "last"):
        raise ValueError(
            f"on_duplicate must be 'raise' or 'last', got {on_duplicate!r}")

    import ray as _ray

    cpus = cluster_cpus()
    nshards = max(32, cpus * 4)

    def _shard_col(doc_ids: pa.ChunkedArray) -> pa.Array:
        # schema.crc32_shard: THE shared process-stable doc→shard key
        return pa.array(
            [crc32_shard(d, nshards) for d in doc_ids.to_pylist()],
            type=pa.int32(),
        )

    # ONE explicit tagged schema for both sides: list<struct> field names
    # differ between a parquet-read column ("element") and pa.nulls
    # ("item"), and mismatched sides make the union's schema unification
    # warn and re-cast per block
    tagged_schema = pa.schema(
        list(CORPUS_SCHEMA) + [pa.field("shard", pa.int32())])

    def tag_input(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "spans": batch["spans"].cast(CORPUS_SCHEMA.field("spans").type),
                "ref_spans": pa.nulls(n, CORPUS_SCHEMA.field("ref_spans").type),
                "shard": _shard_col(batch["doc_id"]),
            },
            schema=tagged_schema,
        )

    def tag_ref(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "spans": pa.nulls(n, CORPUS_SCHEMA.field("spans").type),
                "ref_spans": batch["ref_spans"].cast(
                    CORPUS_SCHEMA.field("ref_spans").type),
                "shard": _shard_col(batch["doc_id"]),
            },
            schema=tagged_schema,
        )

    def merge_shard(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ids = group["doc_id"].to_pylist()
        in_rows = np.flatnonzero(
            group["spans"].is_valid().combine_chunks().to_numpy(
                zero_copy_only=False))
        ref_rows = np.flatnonzero(
            group["ref_spans"].is_valid().combine_chunks().to_numpy(
                zero_copy_only=False))
        in_map: dict = {}
        ref_map: dict = {}
        for side, rows, mp in (("input", in_rows, in_map),
                               ("ref", ref_rows, ref_map)):
            for k in rows.tolist():
                did = ids[k]
                if did in mp and on_duplicate == "raise":
                    raise NonUniqueRefError(
                        f"doc_id {did!r} occurs more than once on the "
                        f"{side} side of the pair join")
                mp[did] = k  # 'last' keeps the last non-null occurrence
        common = sorted(set(in_map) & set(ref_map))
        if missing == "abort" and (
                len(common) != len(in_map) or len(common) != len(ref_map)):
            lonely_in = set(in_map) - set(ref_map)
            lonely_ref = set(ref_map) - set(in_map)
            did, side = (
                (min(lonely_in), "ref") if lonely_in
                else (min(lonely_ref), "input"))
            raise MissingInputError(
                f"doc_id {did!r} has no {side}-side row (missing='abort')")
        if not common:
            return CORPUS_SCHEMA.empty_table()
        take_in = pa.array([in_map[d] for d in common], type=pa.int64())
        take_ref = pa.array([ref_map[d] for d in common], type=pa.int64())
        return pa.Table.from_arrays(
            [
                group["doc_id"].take(take_in).combine_chunks(),
                group["spans"].take(take_in).combine_chunks(),
                group["ref_spans"].take(take_ref).combine_chunks(),
            ],
            schema=CORPUS_SCHEMA,
        )

    tagged = inputs.map_batches(tag_input, batch_format="pyarrow").union(
        refs.map_batches(tag_ref, batch_format="pyarrow")
    )
    # map_groups parallelism is bounded by the shuffle's num_partitions,
    # not the shard-key cardinality — default to one partition per cpu
    # (each holds ~4 shard keys) so the merge uses the whole cluster;
    # an explicit value is honored unchanged
    resolved = num_partitions if num_partitions else min(nshards, max(16, cpus))
    return tagged.groupby(
        "shard", num_partitions=resolved
    ).map_groups(merge_shard, batch_format="pyarrow")
