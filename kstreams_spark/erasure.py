"""Erase-everywhere orchestration (VERDICT r10 task 1): one verb that
removes a document's every trace — content, fingerprints, attributions,
and id references — from the full deployment surface:

- the SERVING indexes (keyword postings + IVF vector indexes), through
  the hybrid maintainer's atomic out-of-band erase (one commit point,
  both legs of a hybrid query flip together —
  streaming/hybrid.py::HybridIngestMaintainer.erase);
- the curation ATTRIBUTION indexes (MinHash near-dup, LSH embedding
  pairs, aHash image dedup, substring windows, boilerplate paragraphs —
  any object exposing ``delete_docs(spark, ids)``), whose accumulated
  state would otherwise keep matching future batches against the erased
  doc's n-grams/hashes forever;
- the LAKE (partitioned parquet via io.delete_where, or a snapshot lake
  via lake_snapshot.snapshot_delete_where).

Ordering, and why (documented per the r10 verdict ask): user-facing
READS stop first (serving — the atomic hide), then the curation state
(attribution), then the lake LAST. The lake copy is the source of truth
a re-run re-derives the request from: every step is idempotent, so the
recovery story for a crash anywhere is simply "run erase_document again
with the same ids" — which only works while the doc is still findable.
Deleting the lake first would leave fingerprints alive with nothing to
point the re-run at.

Physical removal: each step's delete verb hides immediately and defers
physical bytes to that component's own compaction (serving compact(),
the attribution indexes' compact(), lake rewrite happens inline in
delete_where). Run the compactions on their normal maintenance cadence;
`erase_document` is the logical-erasure commit, not the vacuum.

Contract: single actor across ALL components (streams quiescent — the
same assumption every component's maintenance verb already carries);
idempotent under re-run with the same ids.

Lake-derived deployments (r12): when the serving group is DERIVED from
the snapshot lake (HybridIngestMaintainer.bootstrap_from_lake +
apply_snapshot_changes — streaming/hybrid.py), erasure collapses to two
verbs: snapshot_delete_where in the lake (one manifest commit), then
apply_snapshot_changes (one atomic derive that removes the doc from
every index leg at once — byte-equal to an erased-world rebuild, pinned
in tests/test_lake_derivation.py). This orchestrator's hybrid leg is
for the remaining shape: serving groups fed by their own ingest stream
with no lake to derive from.

Scope boundaries, stated plainly (what erase_document does NOT reach):

- **Aggregate sketch state** (CMS/HLL maintenance, the DSIR importance
  scorer's per-bucket count partials, rollup OHLC/TWAP cells): these
  hold COUNTS with no per-doc attribution — a doc's contribution is
  not recoverable, which is also why such aggregates are generally
  treated as anonymized rather than erasable. Recomputing them from
  the post-erasure corpus is the remedy when a policy demands it.
- **Packing manifests** (sample_sequence_pack and the streaming
  packer): sequence offsets are cumulative, so removing one doc's
  spans shifts every later chunk — erasure there is a REPACK from the
  post-erasure corpus (the manifest is derived data; rebuild, don't
  edit).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import SparkSession


def erase_document(
    spark: SparkSession,
    doc_ids: Sequence[int],
    *,
    hybrid=None,
    attribution: Iterable = (),
    lake_path: str | None = None,
    lake_id_col: str = "doc_id",
    lake_partition_cols: tuple[str, ...] = ("split", "lang"),
) -> dict:
    """Erase `doc_ids` everywhere. Each component is optional — pass
    what the deployment runs:

    - ``hybrid``: a streaming.hybrid.HybridIngestMaintainer (its ingest
      stream quiescent); erased via its atomic erase().
    - ``attribution``: iterable of index objects exposing
      ``delete_docs(spark, ids)`` (the five streaming attribution
      indexes, or anything matching the verb).
    - ``lake_path``: a partitioned parquet lake; rows with
      ``lake_id_col`` in `doc_ids` are copy-on-write deleted. If the
      lake carries a snapshot log (lake_snapshot.py `_log/`), the
      delete goes through snapshot_delete_where — one cross-partition
      atomic commit, and the pre-erasure snapshot stays time-travel
      readable until vacuum() (run vacuum to complete PHYSICAL
      erasure on a snapshot lake; the report flags this).

    Returns a report dict: {"serving_epoch": int | None,
    "attribution": n_indexes, "lake_rows_deleted": int | None,
    "lake_needs_vacuum": bool}.
    Re-runnable: every leg is idempotent, so a crash at any point is
    recovered by calling again with the same ids."""
    ids = [int(i) for i in doc_ids]
    if not ids:
        raise ValueError("erase_document needs at least one doc id")
    report: dict = {
        "serving_epoch": None,
        "attribution": 0,
        "lake_rows_deleted": None,
        "lake_needs_vacuum": False,
    }
    # 1. serving — user-facing reads stop first, atomically on all legs
    if hybrid is not None:
        ids_df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        report["serving_epoch"] = hybrid.erase(ids_df)
    # 2. attribution — the dedup/curation state stops matching the doc
    for index in attribution:
        index.delete_docs(spark, ids)
        report["attribution"] += 1
    # 3. lake last — the source a crashed run re-derives the erase from
    if lake_path is not None:
        from kstreams_spark.lake_snapshot import snapshot_versions

        cond = f"{lake_id_col} IN ({', '.join(str(i) for i in ids)})"
        if snapshot_versions(lake_path):
            from kstreams_spark.lake_snapshot import snapshot_delete_where

            report["lake_rows_deleted"] = snapshot_delete_where(
                spark, lake_path, cond, partition_cols=lake_partition_cols
            )
            # logical erasure committed; the erased rows stay readable
            # via older snapshots until vacuum() — the caller's
            # retention policy decides when history folds
            report["lake_needs_vacuum"] = True
        else:
            from kstreams_spark.io import delete_where

            report["lake_rows_deleted"] = delete_where(
                spark, lake_path, cond, partition_cols=lake_partition_cols
            )
    return report
