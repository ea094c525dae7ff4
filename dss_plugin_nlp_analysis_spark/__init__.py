"""PySpark-native knowledge-graph construction engine.

A from-scratch re-imagination of the semantics of
dataiku/dss-plugin-nlp-analysis (ontology tagging over text corpora) as a
distributed Spark dataflow over Common-Crawl-style web-page tables, per
SURVEY.md / SEMANTICS.md. No code is ported from the reference; reference
citations in docstrings are *behavioral* pointers for parity review.
"""

__version__ = "0.1.0"
