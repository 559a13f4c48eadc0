"""pdf_parse_new_spark — a PySpark-native transcript main-content extraction engine.

A from-scratch reimplementation of the *capabilities* of
``simonegosetto/pdf-parse-new`` (reference at ``/root/reference``, MIT, Node.js)
re-expressed Spark-first: the reference's per-page text-extraction dataflow
(header check -> xref walk -> FlateDecode -> content-stream tokenization ->
Y-tolerance line fold -> ordered page concat) becomes a vectorized
Arrow/pandas pipeline over an Iceberg-style table of multi-turn transcripts::

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

Architecture (see SURVEY.md for the operator-by-operator mapping):

- ``kernels/``    per-payload extraction kernels (PDF byte-stream tokenizer,
                  HTML boilerplate strip, plain-text normalize) — pure
                  functions over pandas/numpy batches, no Spark imports.
- ``operators/``  DataFrame-level operators: ``extract`` (mapInPandas),
                  ``concat`` (ordered group-agg with salted skew handling),
                  ``dedup`` / ``similarity`` / ``textstats`` (training-data ops).
- ``sources/``    read/write + checkpointed idempotent resume + per-partition
                  lineage manifests.
- ``plans/``      driver-side stats-probe planner (the SmartPDFParser analog,
                  reference lib/SmartPDFParser.js:195-294).
- ``fixtures``    deterministic synthetic transcript corpus (seed=42).
- ``oracle``      single-node pure-Python golden extractor (plays the role of
                  the reference's golden .txt files, test/01-valid-default.js:22-25).

Everything here derives only from public knowledge: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from pdf_parse_new_spark.spec import Y_TOLERANCE, TJ_SPACE_THRESHOLD  # noqa: F401
