"""PySpark-native analytics engine with the capability surface of the
reference pipeline (JJ-ama-LL/Data-Pipeline-and-Visualization-Dashboard):
ingest -> validate -> clean -> derive -> persist -> SQL analytics -> chart
contracts, extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Everything is expressed as lazy DataFrame transformations so Catalyst owns
pushdown / pruning / join strategy; Python UDFs are avoided on the hot path.
"""

__version__ = "0.1.0"
