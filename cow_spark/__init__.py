"""cow_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the CLARIAH/COW CSVW-declarative converter
(reference at /root/reference, studied for *what* it computes, not *how*)
as an idiomatic Spark pipeline over transcript / tabular inputs:

- declarative JSON mapping spec  -> compiled Column expressions (Catalyst
  optimizes; whole-stage codegen on the hot path)
- Jinja2 template fallback       -> Arrow-batched pandas UDFs (never
  per-row Python over the JVM boundary)
- triples + nanopub provenance   -> quad DataFrames written to bucketed
  Parquet/Iceberg tables and N-Quads text

Package layout mirrors SURVEY.md §7:
  spec/       mapping-spec parsing + template compiler
  functions/  IRI encoding, portable hashing, text analysis functions
  operators/  triple extraction, mentions, linking, canonicalization,
              dedup, similarity search
  sources/    synthetic transcripts, CSV dialect reader, sinks
  plans/      nanopublication provenance, checkpoint/resume, metrics
  streaming/  Structured Streaming ingestion
"""

__version__ = "0.2.0"

# curated top-level surface (the three names every consumer starts with;
# everything else stays addressed by submodule, mirroring the layout)
from .session import get_session  # noqa: E402
from .spec.mapping import MappingSpec  # noqa: E402
from .operators.extract import extract_quads  # noqa: E402

__all__ = ["get_session", "MappingSpec", "extract_quads", "__version__"]
