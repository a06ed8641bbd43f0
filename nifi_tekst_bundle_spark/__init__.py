"""nifi_tekst_bundle_spark — a from-scratch PySpark-native CDC/incremental-ingest
engine with the query/data-processing capabilities of
NationalLibraryOfNorway/nifi-tekst-bundle (reference, read-only, at
/root/reference/), re-expressed Spark-first.

The reference is a bundle of NiFi processors whose computational core
(ReorderFiles.kt) applies batches of change events to replicated stores as a
transactional, idempotent rename/move/delete commit — i.e. CDC apply. This
package rebuilds those semantics as:

- a change-event log (``schemas.CHANGE_EVENT_SCHEMA``) applied per micro-batch
  with declarative batch semantics (``operators.apply``),
- per-key per-column last-writer-wins resolution by ``lsn``
  (``operators.lww``), replacing the reference's implicit list-order wins,
- an Iceberg-semantics-compatible snapshot table with bucket-level
  copy-on-write MERGE and epoch-fenced atomic commits (``table.lake``),
- a Structured Streaming wrapper with checkpointed exactly-once resume
  (``streaming.runner``),
- vectorized text enrichment / dedup / similarity operators for
  training-data pipelines (``functions``, ``operators.dedup``,
  ``operators.similarity``).

Everything here derives from the public Apache Spark API and the reference's
observable behavior only.
"""

__version__ = "0.1.0"
