"""flexneuart_spark — a PySpark-native re-creation of FlexNeuART's classic
retrieval core (oaqa/FlexNeuART): distributed inverted-index build + BM25
top-k query engine, plus large-scale training-data pipeline operators.

Reference: /root/reference (read-only). This is a from-scratch Spark-first
design, not a port — see SURVEY.md for the semantic parity map.
"""

__version__ = "0.1.0"
