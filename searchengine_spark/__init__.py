"""searchengine_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new, Spark-first rebuild of the capabilities of the reference
search engine (VirusMS/searchEngine, a Java/Spring/MySQL web search
engine): corpus ingestion, text extraction, lemma tokenization,
distributed inverted-index construction (salted/skew-aware, delta-gap +
varbyte compressed, block-max annotated), BM25 top-k retrieval with
block-max WAND pruning, snippets, stats, incremental updates, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Everything is expressed as pyspark.sql DataFrames; Python only runs
inside Arrow-batched pandas UDFs / applyInPandas kernels.
"""

__version__ = "0.1.0"
