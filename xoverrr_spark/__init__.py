"""xoverrr_spark — a PySpark-native data-quality / quality-filter engine.

A from-scratch rebuild of the capabilities of ``dima-ischenko/xoverrr``
(reference at /root/reference, a single-process pandas library) re-expressed
as distributed Spark DataFrame plans:

- ``operators.diff``    — keyed row-diff engine (reference ``utils.py:405`` compare_dataframes)
- ``operators.counts``  — per-day row-count reconciliation (reference ``core.py:321``)
- ``operators.sniff``   — row-level rule evaluation (reference ``core.py:620``)
- ``functions.*``       — canonical-string normalization, language-ID, perplexity,
                          caption quality heuristics, PII/toxicity scrubbing
- ``pipeline.*``        — the image+caption quality-filter pipeline with a
                          checkpointed, resumable, partition-bucketed runner
- ``operators.dedup`` / ``operators.similarity`` / ``operators.multimodal``
                        — training-data-pipeline ops (MinHash-LSH, SimHash,
                          ANN top-k, binary image columns)

Everything is built on the public PySpark DataFrame API; Catalyst does the
physical planning. No code is copied from the reference — file:line citations
in docstrings identify the *behavior* being matched.
"""

__version__ = "0.1.0"
